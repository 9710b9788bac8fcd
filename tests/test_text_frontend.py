"""Hermetic unit tests for the text frontend.

Ports the reference's test philosophy (tests/test_phonemizers.py): exact
string contracts for the pure regex pipeline, structural contracts for
tokenization.  eSpeak/NeMo-dependent paths are exercised only if installed.
"""

import pytest

from matcha_tpu.text.symbols import (
    N_VOCAB,
    POST_ID,
    PRE_ID,
    SPACE_ID,
    symbol_to_id,
    symbols,
    voiced_phoneme_ids,
)
from matcha_tpu.text.phonemizers import (
    cleanup_text,
    emphasize_intonation_marks,
    tokenize_phonemes,
)


class TestSymbols:
    def test_layout_contract(self):
        assert symbols[0] == "|"
        assert N_VOCAB == 600
        assert PRE_ID == 200 and POST_ID == 400
        assert len(symbols) < PRE_ID
        assert symbols[SPACE_ID] == " "

    def test_ids_are_dense_and_stable(self):
        assert [symbol_to_id[s] for s in symbols] == list(range(len(symbols)))
        # spot-check a few IDs that are baked into existing checkpoints
        assert symbol_to_id[";"] == 1
        assert symbol_to_id["?"] == 6
        assert symbol_to_id[" "] == SPACE_ID == 24
        assert symbol_to_id["a"] == 25

    def test_voiced_excludes_punctuation_and_annotations(self):
        for ch in ";:,.!? ˈˌː":
            assert symbol_to_id[ch] not in voiced_phoneme_ids


class TestCleanupText:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Hello world", "Hello world."),
            ("Hello world.", "Hello world."),
            ("Hello world!", "Hello world!"),
            ("Hello world?", "Hello world?"),
            ('She said "yes"', "She said yes."),
            ("«quoted»", "quoted."),
            ("one (two) three", "one, two, three."),
            ("a [b] c", "a, b, c."),
            ("wait — what", "wait, what."),
            ("He thought… and then spoke.", "He thought, and then spoke."),
            ("2020–2025.", "2020, 2025."),
            ("Hello , world .", "Hello, world."),
            (", leading comma", "leading comma."),
            ("a ,, b", "a, b."),
            ("end , .", "end."),
            ("  padded  ", "padded."),
        ],
    )
    def test_exact(self, raw, expected):
        assert cleanup_text(raw) == expected

    def test_idempotent_on_clean_text(self):
        # (Trailing-ellipsis inputs produce a ',.' wart on the first pass —
        # reference parity — so idempotency only holds for already-clean text.)
        for raw in ['a "b" c', "Hello, world.", "z"]:
            once = cleanup_text(raw)
            assert cleanup_text(once) == once


class TestEmphasizeIntonation:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Really?", "Really??"),
            ("Really??", "Really??"),
            ("Really?!", "Really?!"),
            ("Really!?", "Really!?"),
            ("A? B?", "A?? B??"),
            ("No marks.", "No marks."),
        ],
    )
    def test_doubling(self, raw, expected):
        assert emphasize_intonation_marks(raw) == expected

    def test_idempotent(self):
        s = "One? Two?! Three??"
        assert emphasize_intonation_marks(emphasize_intonation_marks(s)) == (
            emphasize_intonation_marks(s)
        )


class TestTokenizePhonemes:
    def test_voiced_triple_expansion(self):
        debug, ids = tokenize_phonemes("a")
        a = symbol_to_id["a"]
        assert ids == [PRE_ID + a, a, POST_ID + a]
        assert debug == "‹a›"

    def test_unvoiced_passthrough(self):
        debug, ids = tokenize_phonemes(" ˈ.")
        assert ids == [SPACE_ID, symbol_to_id["ˈ"], symbol_to_id["."]]
        assert debug == " ˈ."

    def test_mixed_sequence_structure(self):
        ipa = " ˈhɛloʊ."
        debug, ids = tokenize_phonemes(ipa)
        voiced = sum(1 for ch in ipa if symbol_to_id[ch] in voiced_phoneme_ids)
        unvoiced = len(ipa) - voiced
        assert len(ids) == 3 * voiced + unvoiced
        # reconstruct from debug string: chars between ‹› are voiced
        assert debug.count("‹") == debug.count("›") == voiced

    def test_all_ids_in_vocab(self):
        _, ids = tokenize_phonemes(" ˈhɛloʊ wˈɜːld.")
        assert all(0 <= i < N_VOCAB for i in ids)

    def test_unknown_symbol_raises(self):
        with pytest.raises(KeyError):
            tokenize_phonemes("✗")


class TestEspeakIntegration:
    """Only runs when phonemizer + espeak are present (they are host deps)."""

    def test_full_pipeline_if_available(self):
        pytest.importorskip("phonemizer")
        from matcha_tpu.text.phonemizers import multilingual_phonemizer

        debug, ids = multilingual_phonemizer("Hello world.", "en-us")
        assert len(ids) > 5
        assert ids[0] == SPACE_ID  # leading silence anchor
        assert all(0 <= i < N_VOCAB for i in ids)

    def test_selftest_if_available(self):
        pytest.importorskip("phonemizer")
        from matcha_tpu.text.phonemizers import selftest

        selftest()  # the docker build-time gate; raises on any failure


class TestValidateTripleStructure:
    """Pure structural validator behind the --selftest gate."""

    def test_accepts_tokenizer_output(self):
        from matcha_tpu.text.phonemizers import validate_triple_structure

        _, ids = tokenize_phonemes(" ˈhɛloʊ wˈɜːld.")
        validate_triple_structure(ids)

    def test_rejects_missing_pre(self):
        from matcha_tpu.text.phonemizers import validate_triple_structure

        a = symbol_to_id["a"]
        with pytest.raises(AssertionError, match="lacks PRE"):
            validate_triple_structure([a, POST_ID + a])

    def test_rejects_dangling_post(self):
        from matcha_tpu.text.phonemizers import validate_triple_structure

        a = symbol_to_id["a"]
        b = symbol_to_id["b"]
        with pytest.raises(AssertionError, match="POST"):
            validate_triple_structure([PRE_ID + a, a, POST_ID + b])
