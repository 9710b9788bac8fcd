"""Streaming synthesis: segmentation invariants + service/HTTP round-trips.

The stream path is beyond-reference (the reference returns one blob after
full synthesis; matcha/server.py:94-127): long input splits into
sentence-aligned segments that micro-batch together, and audio chunks
stream out in order as segments complete.
"""

from __future__ import annotations

import http.client
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from matcha_tpu.serving.streaming import (
    split_ids,
    split_text,
    wav_stream_header,
)
from matcha_tpu.text.symbols import SPACE_ID


class TestSplitText:
    def test_short_text_single_segment(self):
        assert split_text("Hello there.") == ["Hello there."]

    def test_sentences_pack_up_to_budget(self):
        text = "One. Two. Three. Four."
        segs = split_text(text, max_chars=12)
        assert all(len(s) <= 12 for s in segs)
        # sentence boundaries respected: every segment ends with a period
        assert all(s.rstrip().endswith(".") for s in segs)
        assert " ".join(s.strip() for s in segs).split() == text.split()

    def test_runon_sentence_hard_splits_at_words(self):
        text = "word " * 40  # no terminators at all
        segs = split_text(text, max_chars=50)
        assert len(segs) > 1
        assert all(len(s) <= 50 for s in segs)
        assert all("word" in s and not s.startswith("ord") for s in segs)
        assert " ".join(segs).split() == text.split()

    def test_unsplittable_token_still_terminates(self):
        segs = split_text("x" * 120, max_chars=50)
        assert "".join(segs) == "x" * 120

    def test_empty_and_whitespace(self):
        assert split_text("") == []
        assert split_text("   ") == []

    def test_leading_terminators_fold_into_next_sentence(self):
        # an unattached "..." is a pause cue: it must stay in the stream
        # attached to the sentence that follows, not be silently dropped
        segs = split_text("...Hello there. Bye now.", max_chars=18)
        assert segs[0].startswith("...")
        assert [s.strip() for s in segs] == ["...Hello there.", "Bye now."]

    def test_terminator_only_text_passes_through(self):
        # no sentence body at all: pass through whole and let the
        # phonemizer decide whether anything speakable comes out
        assert split_text("...") == ["..."]
        assert split_text("?!") == ["?!"]


class TestSplitIds:
    def _ids(self, n, space_every=10):
        ids = []
        for i in range(n):
            ids.append(SPACE_ID if i % space_every == space_every - 1 else 7)
        return ids

    def test_concatenation_invariant(self):
        ids = self._ids(500)
        segs = split_ids(ids, target=60)
        assert sum(segs, []) == ids
        assert len(segs) > 1

    def test_cuts_land_on_spaces(self):
        ids = self._ids(400, space_every=9)
        segs = split_ids(ids, target=50)
        # every segment except the last ends with the silence space
        assert all(s[-1] == SPACE_ID for s in segs[:-1])

    def test_no_spaces_hard_cut(self):
        ids = [7] * 300
        segs = split_ids(ids, target=60)
        assert sum(segs, []) == ids
        assert all(len(s) <= 2 * 60 + 1 for s in segs)

    def test_short_input_passthrough(self):
        ids = self._ids(50)
        assert split_ids(ids, target=60) == [ids]
        assert split_ids([], target=60) == []


def test_wav_stream_header_shape():
    h = wav_stream_header()
    assert len(h) == 44
    assert h[:4] == b"RIFF" and h[8:12] == b"WAVE" and h[36:40] == b"data"
    # streaming sizes: both RIFF and data chunk sizes maximal
    assert h[4:8] == b"\xff\xff\xff\xff" and h[40:44] == b"\xff\xff\xff\xff"


# ---------------------------------------------------------------------------
# service / HTTP round-trips on the tiny model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def service():
    import jax

    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import tiny_config
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.serving.server import TTSService
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    cfg = tiny_config()
    vcfg = VocosConfig(
        input_channels=cfg.n_feats, dim=32, intermediate_dim=64, num_layers=1
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), vcfg)
    synth = MatchaSynthesizer(
        cfg, params, vocos_params, vcfg,
        text_buckets=(16, 32, 64), mel_fine_buckets=(64, 128, 256, 512),
    )
    svc = TTSService(synth, use_batcher=True)
    svc.ready = True
    yield svc
    if svc.batcher:
        svc.batcher.shutdown()


def _segmentable_ids(n=80, space_every=8):
    ids = []
    for i in range(n):
        ids.append(SPACE_ID if i % space_every == space_every - 1 else 12)
    return ids


@pytest.mark.slow
class TestSpeakStream:
    def test_chunks_match_per_segment_synthesis(self, service, monkeypatch):
        monkeypatch.setenv("STREAM_SEGMENT_TOKENS", "24")
        ids = _segmentable_ids()
        body = {"phoneme_ids": ids, "voice": "0", "steps": 2,
                "stream": True, "response_format": "pcm"}
        chunks, ctype = service.speak_stream(body)
        chunks = list(chunks)
        assert ctype == "audio/pcm"
        segs = split_ids(ids, target=24)
        assert len(chunks) == len(segs) > 1
        # each chunk equals the direct synthesis of its segment (the batch
        # grouping must not change any utterance's audio)
        for chunk, seg in zip(chunks, segs):
            direct = service.synth.synthesise_ids(seg, n_timesteps=2)
            expect = (np.clip(direct.wav, -1, 1) * 32767).astype("<i2")
            got = np.frombuffer(chunk, dtype="<i2")
            assert got.shape == expect.shape
            np.testing.assert_allclose(got, expect, atol=2)

    def test_wav_format_prepends_stream_header(self, service, monkeypatch):
        monkeypatch.setenv("STREAM_SEGMENT_TOKENS", "24")
        body = {"phoneme_ids": _segmentable_ids(), "voice": "0", "steps": 2,
                "stream": True, "response_format": "wav"}
        chunks, ctype = service.speak_stream(body)
        chunks = list(chunks)
        assert ctype == "audio/wav"
        assert chunks[0] == wav_stream_header()

    def test_unstreamable_format_rejected_before_first_chunk(self, service):
        body = {"phoneme_ids": _segmentable_ids(), "stream": True,
                "response_format": "mp3"}
        with pytest.raises(ValueError, match="not streamable"):
            service.speak_stream(body)

    def test_stream_text_cap_applies(self, service, monkeypatch):
        monkeypatch.setenv("STREAM_MAX_TEXT_LENGTH", "10")
        with pytest.raises(ValueError, match="exceeds 10"):
            service.speak_stream({"input": "x" * 11, "stream": True})

    def test_submit_error_raises_before_first_chunk(self, service,
                                                    monkeypatch):
        # segment futures are submitted EAGERLY inside speak_stream, so a
        # submission-time failure (e.g. the batcher wedge fail-fast) maps
        # to a pre-commit 5xx rather than an empty/truncated 200 body
        def boom(*args, **kwargs):
            raise RuntimeError("synthesis backend wedged")

        monkeypatch.setattr(service.batcher, "submit", boom)
        with pytest.raises(RuntimeError, match="wedged"):
            service.speak_stream(
                {"phoneme_ids": _segmentable_ids(), "stream": True,
                 "response_format": "pcm"}
            )

    def test_empty_phonemization_segments_are_skipped(self, service,
                                                      monkeypatch):
        # a symbol-only text segment can phonemize to an empty id list; it
        # must never be submitted as an empty mid-stream utterance
        import matcha_tpu.text.phonemizers as ph

        def fake_phonemizer(text, lang):
            if "zzz" in text:
                return "", []
            return "", _segmentable_ids(20)

        monkeypatch.setattr(ph, "multilingual_phonemizer", fake_phonemizer)
        monkeypatch.setattr(
            ph, "emphasize_intonation_marks", lambda t: t
        )
        monkeypatch.setenv("STREAM_SEGMENT_CHARS", "8")
        chunks, _ = service.speak_stream(
            {"input": "Hello. zzz.", "voice": "0", "steps": 2,
             "stream": True, "response_format": "pcm"}
        )
        chunks = list(chunks)
        assert len(chunks) == 1 and len(chunks[0]) > 0

    def test_segment_target_clamped_to_bucket_ladder(self, service,
                                                     monkeypatch):
        # A segment larger than the biggest text bucket would raise MID
        # stream (after the 200 commits) and truncate the body.  The
        # service must clamp the knob to the ladder (largest bucket here
        # is 64; the knob asks for 500-token segments).
        monkeypatch.setenv("STREAM_SEGMENT_TOKENS", "500")
        ids = _segmentable_ids(n=200)
        body = {"phoneme_ids": ids, "voice": "0", "steps": 2,
                "stream": True, "response_format": "pcm"}
        chunks, _ = service.speak_stream(body)
        chunks = list(chunks)  # raises if any segment overflows a bucket
        assert len(chunks) > 1
        assert all(len(c) > 0 for c in chunks)


@pytest.mark.slow
def test_http_stream_roundtrip(service, monkeypatch):
    monkeypatch.setenv("STREAM_SEGMENT_TOKENS", "24")
    from matcha_tpu.serving.server import make_handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        ids = _segmentable_ids()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request(
            "POST", "/v1/audio/speech",
            body=json.dumps({"phoneme_ids": ids, "voice": "0", "steps": 2,
                             "stream": True, "response_format": "pcm"}),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        # chunked framing is HTTP/1.1-only; the handler must declare 1.1
        # or strict HTTP/1.0 intermediaries deliver the framing bytes as
        # body (ADVICE r3)
        assert resp.version == 11
        assert resp.getheader("Content-Type") == "audio/pcm"
        assert resp.getheader("Transfer-Encoding") == "chunked"
        data = resp.read()
        # keep-alive: the same connection must serve a follow-up request
        # after a fully-consumed chunked response
        conn.request(
            "POST", "/v1/audio/speech",
            body=json.dumps({"phoneme_ids": ids[:16], "voice": "0",
                             "steps": 2, "response_format": "pcm"}),
            headers={"Content-Type": "application/json"},
        )
        resp2 = conn.getresponse()
        assert resp2.status == 200
        assert len(resp2.read()) > 0
        conn.close()
        # body equals the service-level stream concatenation
        chunks, _ = service.speak_stream(
            {"phoneme_ids": ids, "voice": "0", "steps": 2,
             "stream": True, "response_format": "pcm"}
        )
        expect = b"".join(chunks)
        got = np.frombuffer(data, dtype="<i2")
        want = np.frombuffer(expect, dtype="<i2")
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2)
    finally:
        httpd.shutdown()
