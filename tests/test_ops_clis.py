"""End-to-end tests for the small ops CLIs that had none:

* validate_corpus_ipa — atomic column-5 ID write-back + unknown-symbol
  reporting (phonemizer stubbed: live eSpeak is env-gated elsewhere)
* prepare_ckpt_for_release — optimizer state dropped, params round-trip
* analyze_padding — synthetic report fields
* print_config — tree formatting
"""

from __future__ import annotations

import numpy as np
import pytest


class TestValidateCorpusIpa:
    def _write(self, tmp_path, rows):
        f = tmp_path / "train.csv"
        f.write_text("\n".join("|".join(r) for r in rows))
        return f

    def test_rows_with_ids_pass_through_unchanged(self, tmp_path, capsys):
        from matcha_tpu.utils import validate_corpus_ipa as cli

        rows = [
            ["s/u0", "0", "en-us", "hello there", "5 6 7"],
            ["s/u1", "1", "en-us", "bye", "9 10"],
        ]
        f = self._write(tmp_path, rows)
        cli.main(["--filelist", str(f)])
        out = capsys.readouterr().out
        assert "tokenized=0 invalid=0 total=2" in out
        kept = [l.split("|") for l in f.read_text().splitlines()]
        assert kept == rows

    def test_missing_ids_get_tokenized_and_written_back(
        self, tmp_path, capsys, monkeypatch
    ):
        from matcha_tpu.text.phonemizers import tokenize_phonemes
        from matcha_tpu.utils import validate_corpus_ipa as cli

        # stub the eSpeak-backed phonemizer with a fixed known-good IPA
        # string; the inventory mapping under test stays the real one
        ipa = "ə"
        monkeypatch.setattr(cli, "phonemize", lambda text, lang: ipa)
        rows = [["s/u0", "0", "en-us", "hello there", ""]]
        f = self._write(tmp_path, rows)
        cli.main(["--filelist", str(f)])
        out = capsys.readouterr().out
        assert "tokenized=1 invalid=0 total=1" in out
        written = f.read_text().splitlines()[0].split("|")
        expected_ids = " ".join(map(str, tokenize_phonemes(ipa)[1]))
        assert written[4] == expected_ids

    def test_unknown_symbols_reported_not_written(
        self, tmp_path, capsys, monkeypatch
    ):
        from matcha_tpu.utils import validate_corpus_ipa as cli

        monkeypatch.setattr(cli, "phonemize", lambda text, lang: "ə☃")
        rows = [["s/u0", "0", "en-us", "snowman", ""]]
        f = self._write(tmp_path, rows)
        cli.main(["--filelist", str(f)])
        out = capsys.readouterr().out
        assert "invalid=1" in out and "unknown symbols" in out
        written = f.read_text().splitlines()[0].split("|")
        assert len(written) == 4  # no ID column written for the bad row


class TestPrepareCkptForRelease:
    def test_strips_optimizer_state(self, tmp_path, capsys):
        import jax

        from matcha_tpu.models.config import tiny_config
        from matcha_tpu.models.matcha import init_params
        from matcha_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from matcha_tpu.utils import prepare_ckpt_for_release as cli

        cfg = tiny_config()
        params = jax.tree.map(np.asarray, init_params(cfg, jax.random.PRNGKey(0)))
        tree = {
            "params": params,
            "opt_state": {"mu": jax.tree.map(np.zeros_like, params)},
            "step": np.asarray(123),
        }
        src = tmp_path / "ckpt_full"
        dst = tmp_path / "ckpt_release"
        save_checkpoint(src, tree, cfg)
        cli.main(["--input", str(src), "--output", str(dst)])
        assert "stripped" in capsys.readouterr().out
        out_tree, out_cfg = load_checkpoint(dst)
        assert "opt_state" not in out_tree
        assert int(np.asarray(out_tree["step"])) == 123
        assert out_cfg == cfg
        a = jax.tree_util.tree_leaves(out_tree["params"])
        b = jax.tree_util.tree_leaves(params)
        assert len(a) == len(b)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestAnalyzePadding:
    def test_synthetic_report(self, capsys):
        from matcha_tpu.data.analyze_padding import main

        main(["--synthetic", "64", "--max_frames", "4096", "--len_bucket", "32"])
        out = capsys.readouterr().out
        assert "utterances: 64" in out
        assert "bucketed waste:" in out
        assert "distinct batch shapes" in out
        assert "co-occurrence" in out


class TestPrintConfig:
    def test_tree_formatting(self, capsys):
        from matcha_tpu.utils.print_config import format_tree, print_config

        cfg = {"a": 1, "nested": {"b": "x", "deeper": {"c": 2.5}}}
        tree = format_tree(cfg)
        assert "a: 1" in tree
        assert "  b: 'x'" in tree
        assert "    c: 2.5" in tree
        print_config(cfg, title="t")
        out = capsys.readouterr().out
        assert out.startswith("┌") and "│ t" in out and out.rstrip().endswith("─")
