"""End-to-end inference pipeline tests (tiny config, random weights).

Covers the two-stage bucketed synthesis path, batched synthesis, voice
mixing, trailing-silence trim, and the serving-layer request plumbing —
all hermetic on the CPU test mesh.
"""

import jax
import numpy as np
import pytest

from matcha_tpu.inference import (
    MatchaSynthesizer,
    SynthesisResult,
    pick_bucket,
    trim_trailing_silence,
)
from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import init_params
from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

CFG = tiny_config()
VCFG = VocosConfig(input_channels=CFG.n_feats, dim=32, intermediate_dim=64, num_layers=1)


@pytest.fixture(scope="module")
def synth():
    params = init_params(CFG, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), VCFG)
    return MatchaSynthesizer(
        CFG,
        params,
        vocos_params,
        VCFG,
        text_buckets=(16, 32, 64),
        mel_fine_buckets=(64, 128, 256),
    )


class TestBuckets:
    def test_pick_bucket(self):
        assert pick_bucket(5, (16, 32)) == 16
        assert pick_bucket(16, (16, 32)) == 16
        assert pick_bucket(17, (16, 32)) == 32
        with pytest.raises(ValueError):
            pick_bucket(33, (16, 32))


class TestSynthesiseIds:
    def test_returns_waveform(self, synth):
        ids = list(np.random.default_rng(0).integers(0, 600, 10))
        result = synth.synthesise_ids(ids, speaker=0, n_timesteps=2)
        assert isinstance(result, SynthesisResult)
        assert result.wav.dtype == np.float32
        assert np.isfinite(result.wav).all()
        assert result.rtf > 0

    def test_deterministic(self, synth):
        ids = list(np.random.default_rng(1).integers(0, 600, 8))
        r1 = synth.synthesise_ids(ids, speaker=1, n_timesteps=2)
        r2 = synth.synthesise_ids(ids, speaker=1, n_timesteps=2)
        np.testing.assert_array_equal(r1.wav, r2.wav)

    def test_voice_mix(self, synth):
        ids = list(np.random.default_rng(2).integers(0, 600, 8))
        r = synth.synthesise_ids(ids, voice_mix=[(0, 0.7), (1, 0.3)], n_timesteps=2)
        assert np.isfinite(r.wav).all()

    def test_debug_outputs(self, synth):
        ids = list(np.random.default_rng(3).integers(0, 600, 8))
        r = synth.synthesise_ids(ids, speaker=0, n_timesteps=2, debug=True)
        assert r.mel is not None and r.mel.shape[1] == CFG.n_feats
        assert r.durations is not None and len(r.durations) == len(ids)

    def test_fused_matches_two_stage(self, synth):
        """The single-dispatch fused program must produce the same audio as
        the two-stage path (same model math; only dispatch count differs).
        Padded-bucket invariance makes the comparison exact up to the fp
        noise of a differently-padded program."""
        ids = list(np.random.default_rng(4).integers(0, 600, 10))
        two = synth.synthesise_ids(ids, speaker=1, n_timesteps=2)
        one = synth.synthesise_ids(ids, speaker=1, n_timesteps=2, fused=True)
        assert len(one.wav) == len(two.wav)
        np.testing.assert_allclose(one.wav, two.wav, atol=1e-4)

    def test_fused_overflow_falls_back(self, synth, monkeypatch):
        """When true durations exceed the text-predicted mel bucket, the
        fused path must fall back to the exact two-stage result — never
        truncate speech."""
        # 64 tokens -> >= 64 fine frames (1-frame floor per token); a
        # patched 16-frame prediction guarantees overflow
        ids = list(np.random.default_rng(5).integers(0, 600, 64))
        two = synth.synthesise_ids(ids, speaker=0, n_timesteps=2)
        monkeypatch.setattr(
            synth, "predict_fine_bucket", lambda tx, scale=1.0: 16
        )
        one = synth.synthesise_ids(ids, speaker=0, n_timesteps=2, fused=True)
        np.testing.assert_array_equal(one.wav, two.wav)

    def test_fused_pulls_total_and_wav_in_one_transfer(self, synth, monkeypatch):
        """The fused path must perform exactly ONE device→host pull carrying
        BOTH the total-duration scalar and the waveform (an optimistic
        overlapped transfer) — serialized pulls cost a full transport RTT
        each on remote-dispatch backends (documentation/performance.md)."""
        import matcha_tpu.inference as inf

        calls = []
        real = inf._pull_together
        monkeypatch.setattr(
            inf, "_pull_together",
            lambda *arrays: calls.append(len(arrays)) or real(*arrays),
        )
        ids = list(np.random.default_rng(11).integers(0, 600, 10))
        r = synth.synthesise_ids(ids, speaker=0, n_timesteps=2, fused=True)
        assert np.isfinite(r.wav).all()
        assert calls == [2], f"expected one 2-leaf pull, saw {calls}"

        calls.clear()
        batch = synth.synthesise_batch(
            [ids, ids[:6]], speakers=[0, 1], n_timesteps=2, fused=True
        )
        assert len(batch) == 2
        assert calls == [2], f"expected one 2-leaf pull, saw {calls}"

    def test_fused_batch_matches_two_stage(self, synth):
        rng = np.random.default_rng(6)
        id_lists = [list(rng.integers(0, 600, n)) for n in (8, 12, 5)]
        two = synth.synthesise_batch(id_lists, speakers=[0, 1, 2], n_timesteps=2)
        one = synth.synthesise_batch(
            id_lists, speakers=[0, 1, 2], n_timesteps=2, fused=True
        )
        for a, b in zip(one, two):
            assert len(a.wav) == len(b.wav)
            np.testing.assert_allclose(a.wav, b.wav, atol=1e-4)

    def test_fused_batch_matches_across_bucket_mismatch(self, synth, monkeypatch):
        """The hard case: the fused path's text-predicted mel bucket DIFFERS
        from the two-stage path's duration-derived bucket.  The ODE noise is
        one shared per-row stream whose (t, c) value is invariant to the
        bucket length (seeded_synthesis_noise), so rows k>0 must still match
        exactly — this used to diverge when noise was one flat threefry draw
        over the whole (B, T, C) buffer."""
        rng = np.random.default_rng(7)
        id_lists = [list(rng.integers(0, 600, n)) for n in (8, 12, 5)]
        two = synth.synthesise_batch(id_lists, speakers=[0, 1, 2], n_timesteps=2)
        # force the fused program onto the LARGEST bucket (two-stage derives
        # 64 from the ~1-frame/token durations of random weights)
        monkeypatch.setattr(
            synth, "predict_fine_bucket", lambda tx, scale=1.0: 256
        )
        one = synth.synthesise_batch(
            id_lists, speakers=[0, 1, 2], n_timesteps=2, fused=True
        )
        for a, b in zip(one, two):
            assert len(a.wav) == len(b.wav)
            np.testing.assert_allclose(a.wav, b.wav, atol=1e-4)

    def test_predict_fine_bucket_is_pace_aware(self, synth):
        """The fused mel-bucket prediction must scale with the request's
        effective duration scale: a speed=0.5 request (length_scale 2.0)
        produces ~2× the frames, so it needs the next rung(s) up — without
        the multiply every slow request overflowed and silently paid the
        two-dispatch fallback (VERDICT r3 #3)."""
        # ladder (64, 128, 256); tx=16 → 8 tokens × 8 frames = 64 expected
        assert synth.predict_fine_bucket(16) == 64
        assert synth.predict_fine_bucket(16, 1.0) == 64
        assert synth.predict_fine_bucket(16, 2.0) == 128
        assert synth.predict_fine_bucket(16, 0.1) == 64  # floor: smallest rung
        assert synth.predict_fine_bucket(16, 100.0) == 256  # clamped to top
        # the warm set is the contiguous rung range over the pace clamp
        assert synth.fused_warm_buckets(16) == [64, 128, 256]

    def test_fused_frames_per_token_is_tunable(self, synth, monkeypatch):
        """The frames-per-token pace statistic driving the fused bucket
        prediction is a deployment knob (FUSED_FRAMES_PER_TOKEN): a model
        that speaks ~1 fine frame/token must predict the small rung, not
        8× oversized buckets that waste compute and D2H on every group."""
        monkeypatch.setattr(synth, "fused_frames_per_token", 1.0)
        assert synth.predict_fine_bucket(16) == 64      # floor rung
        assert synth.predict_fine_bucket(256, 1.0) == 128  # 128 tokens ≈ 128 frames
        monkeypatch.setattr(synth, "fused_frames_per_token", 16.0)
        assert synth.predict_fine_bucket(16, 1.0) == 128

    def test_fused_pace_request_hits_warmed_program(self, synth):
        """A length_scale=2.0 fused request must complete in ONE dispatch
        (no two-stage fallback) against a program the fused warmup already
        compiled (no new jit cache entry)."""
        synth.warmup(n_timesteps=2, fused=True)
        n_fused = synth._fused_jit._cache_size()
        calls = []
        orig_encode = synth.__dict__.get("_encode_jit", synth._encode_jit)

        def counting_encode(*a, **k):
            calls.append(1)
            return orig_encode(*a, **k)

        synth._encode_jit = counting_encode
        try:
            ids = list(np.random.default_rng(9).integers(0, 600, 10))
            slow = synth.synthesise_ids(
                ids, speaker=0, n_timesteps=2, length_scale=2.0, fused=True
            )
        finally:
            synth._encode_jit = orig_encode
        assert not calls, "fused slow-pace request fell back to two-stage"
        assert synth._fused_jit._cache_size() == n_fused, (
            "slow-pace fused request compiled a program warmup missed"
        )
        # and the audio still matches the exact two-stage path
        two = synth.synthesise_ids(
            ids, speaker=0, n_timesteps=2, length_scale=2.0
        )
        assert len(slow.wav) == len(two.wav)
        np.testing.assert_allclose(slow.wav, two.wav, atol=1e-4)

    def test_batch_position_does_not_change_audio(self, synth):
        """Serving determinism: an utterance's audio must not depend on which
        batcher-group row it lands in — every row shares the B=1 noise
        stream, so solo synthesis and row-k batched synthesis agree on the
        valid region."""
        rng = np.random.default_rng(8)
        ids = list(rng.integers(0, 600, 9))
        others = [list(rng.integers(0, 600, n)) for n in (7, 11)]
        solo = synth.synthesise_ids(ids, speaker=1, n_timesteps=2)
        batched = synth.synthesise_batch(
            [others[0], others[1], ids], speakers=[0, 2, 1], n_timesteps=2
        )[2]
        assert len(solo.wav) == len(batched.wav)
        np.testing.assert_allclose(solo.wav, batched.wav, atol=1e-4)

    def test_duration_floor_one_frame(self, synth):
        # random weights predict exp(0)-2 < 0 per token, so every duration
        # clips to the 1-frame floor regardless of scale — the contract is
        # durations >= 1 on valid tokens (scale effects need trained logw)
        ids = list(np.random.default_rng(4).integers(0, 600, 12))
        r = synth.synthesise_ids(ids, n_timesteps=2, debug=True)
        assert (r.durations >= 1.0).all()


class TestSynthesiseBatch:
    def test_batch_matches_individual_lengths(self, synth):
        rng = np.random.default_rng(5)
        id_lists = [list(rng.integers(0, 600, n)) for n in (6, 10, 14)]
        results = synth.synthesise_batch(id_lists, speakers=[0, 1, 2], n_timesteps=2)
        assert len(results) == 3
        for r in results:
            assert np.isfinite(r.wav).all()
        # batch metrics: one shared throughput RTF + the call's wall latency
        assert len({r.rtf for r in results}) == 1
        assert all(r.latency_s > 0 for r in results)

    def test_batch_supports_voice_mixes(self, synth):
        rng = np.random.default_rng(7)
        id_lists = [list(rng.integers(0, 600, 8)), list(rng.integers(0, 600, 8))]
        results = synth.synthesise_batch(
            id_lists,
            n_timesteps=2,
            voice_mixes=[[(0, 0.7), (1, 0.3)], [(2, 1.0)]],
        )
        assert len(results) == 2
        assert all(np.isfinite(r.wav).all() for r in results)
        # a mixed request must equal the single-request mix path exactly
        solo = synth.synthesise_ids(
            id_lists[0], voice_mix=[(0, 0.7), (1, 0.3)], n_timesteps=2
        )
        np.testing.assert_allclose(results[0].wav, solo.wav, atol=1e-5)


class TestBlendedScaleCorrection:
    def test_blend_formula(self):
        from matcha_tpu.inference import blended_scale_correction, voice_by_id

        sc0 = voice_by_id(0)["scale_correction"]
        sc1 = voice_by_id(1)["scale_correction"]
        # (reference: matcha/server.py:111-114)
        expect = 0.7 * sc0 + 0.3 * sc1
        assert abs(blended_scale_correction([(0, 0.7), (1, 0.3)]) - expect) < 1e-9
        # unknown voices fall back to 1.0
        assert abs(blended_scale_correction([(999, 1.0)]) - 1.0) < 1e-9


class TestWarmupLadder:
    def test_reachable_pairs(self, synth):
        pairs = synth.reachable_bucket_pairs()
        # text bucket 16 (prev 0): every mel bucket reachable
        assert [(16, m) for m in (64, 128, 256)] == [p for p in pairs if p[0] == 16]
        # text bucket 64 (prev 32): mel 64 unreachable? 64 > 32 → reachable
        assert (64, 64) in pairs

    def test_on_size_ready_walks_the_ladder(self, synth):
        """Progressive-warmup hook: called once per batch size, in ladder
        order, with that size's programs already compiled at call time."""
        seen = []

        def record(b):
            # the b-sized encode program must already be in the jit cache:
            # warming it again must not add a cache entry
            n = synth._encode_jit._cache_size()
            synth._warm_pair(
                synth.text_buckets[0],
                synth.mel_fine_buckets[0],
                2,
                "midpoint",
                b=b,
            )
            assert synth._encode_jit._cache_size() == n
            seen.append(b)

        synth.warmup(n_timesteps=2, batch_sizes=(1, 2), on_size_ready=record)
        assert seen == [1, 2]

    @pytest.mark.slow
    def test_full_warmup_means_no_new_compiles(self, synth):
        synth.warmup(n_timesteps=2, full=True)
        n_enc = synth._encode_jit._cache_size()
        n_dec = synth._decode_jit._cache_size()
        rng = np.random.default_rng(8)
        for n in (3, 17, 40):
            synth.synthesise_ids(list(rng.integers(0, 600, n)), n_timesteps=2)
        assert synth._encode_jit._cache_size() == n_enc
        assert synth._decode_jit._cache_size() == n_dec


class TestTrimTrailingSilence:
    def test_trims_silence(self):
        sr = 24000
        speech = np.random.default_rng(0).uniform(-0.5, 0.5, sr).astype(np.float32)
        silence = np.zeros(sr // 2, np.float32)
        out = trim_trailing_silence(np.concatenate([speech, silence]))
        assert len(out) <= sr + 240  # at most one window of slack
        assert len(out) >= sr - 240

    def test_no_silence_untouched(self):
        speech = np.random.default_rng(0).uniform(-0.5, 0.5, 2400).astype(np.float32)
        np.testing.assert_array_equal(trim_trailing_silence(speech), speech)

    def test_all_silent_trims_everything(self):
        silence = np.zeros(24000, np.float32)
        assert len(trim_trailing_silence(silence)) == 0

    def test_interior_silence_kept(self):
        sr = 24000
        rng = np.random.default_rng(1)
        loud = rng.uniform(-0.5, 0.5, sr // 4).astype(np.float32)
        audio = np.concatenate([loud, np.zeros(sr // 4, np.float32), loud])
        np.testing.assert_array_equal(trim_trailing_silence(audio), audio)


class TestServingLayer:
    def test_parse_voice(self):
        from matcha_tpu.serving.server import parse_voice

        assert parse_voice("3") == [(3, 1.0)]
        mix = parse_voice("2(70)+6(30)")
        assert mix[0][0] == 2 and abs(mix[0][1] - 0.7) < 1e-9
        assert mix[1][0] == 6 and abs(mix[1][1] - 0.3) < 1e-9
        with pytest.raises(ValueError):
            parse_voice("2(70)+bad")

    def test_wav_bytes_header(self):
        from matcha_tpu.serving.server import wav_bytes

        data = wav_bytes(np.zeros(2400, np.float32))
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"

    def test_batcher_groups_requests(self, synth):
        from matcha_tpu.serving.batcher import RequestBatcher

        batcher = RequestBatcher(synth, max_batch=4, max_wait_ms=50)
        rng = np.random.default_rng(6)
        futures = [
            batcher.submit(list(rng.integers(0, 600, 8)), speaker=0, n_timesteps=2)
            for _ in range(3)
        ]
        results = [f.result(timeout=120) for f in futures]
        assert all(np.isfinite(r.wav).all() for r in results)
        batcher.shutdown()


class TestGatherAlignmentEquivalence:
    """The searchsorted-gather prior assembly must be bit-identical to the
    dense generate_path einsum it replaced (reference: inference.py:154-160)."""

    def test_matches_dense_path_matmul(self):
        import jax
        import jax.numpy as jnp

        from matcha_tpu.utils.model_math import generate_path, sequence_mask

        rng = np.random.default_rng(5)
        b, tx, yf, c = 3, 12, 40, 6
        mu_x = jnp.asarray(rng.standard_normal((b, tx, c)).astype(np.float32))
        x_lens = np.array([12, 7, 9])
        x_mask = np.asarray(sequence_mask(jnp.asarray(x_lens), tx), np.float32)
        dur = rng.integers(0, 5, (b, tx)).astype(np.float32) * x_mask
        totals = np.minimum(dur.sum(axis=1).astype(np.int32), yf)
        y_fine_mask = np.asarray(
            sequence_mask(jnp.asarray(totals), yf), np.float32
        )

        attn_mask = x_mask[:, :, None] * y_fine_mask[:, None, :]
        attn = generate_path(jnp.asarray(dur, jnp.int32), jnp.asarray(attn_mask))
        dense = np.einsum("bij,bic->bjc", np.asarray(attn, np.float32), np.asarray(mu_x))

        cum = jnp.cumsum(jnp.asarray(dur, jnp.int32), axis=1)
        frames = jnp.arange(yf, dtype=jnp.int32)
        idx = jax.vmap(lambda cc: jnp.searchsorted(cc, frames, side="right"))(cum)
        idx = jnp.clip(idx, 0, tx - 1)
        gather = np.asarray(
            jnp.take_along_axis(mu_x, idx[..., None], axis=1)
            * jnp.asarray(y_fine_mask)[..., None]
        )
        np.testing.assert_array_equal(gather, dense)

    def test_frames_past_total_duration_are_zero(self):
        """When y_fine_lengths is lower-clamped ABOVE sum(durations) (the
        1-token/1-frame request), frames past the cumsum must be zero —
        matching the dense path matmul — not the last token's mu_x that a
        bare index clip would gather (advisor round-2 finding)."""
        import jax
        import jax.numpy as jnp

        from matcha_tpu.utils.model_math import generate_path, sequence_mask

        rng = np.random.default_rng(6)
        b, tx, yf, c = 2, 4, 8, 3
        mu_x = jnp.asarray(rng.standard_normal((b, tx, c)).astype(np.float32))
        # sample 0: one 1-frame token; sample 1: normal
        dur = np.array([[1, 0, 0, 0], [2, 1, 0, 0]], np.float32)
        # y_fine_lengths clamped to 2 even though sample 0 has 1 total frame
        y_fine_lengths = np.array([2, 3], np.int32)
        y_fine_mask = np.asarray(
            sequence_mask(jnp.asarray(y_fine_lengths), yf), np.float32
        )
        x_mask = np.ones((b, tx), np.float32)

        attn_mask = x_mask[:, :, None] * y_fine_mask[:, None, :]
        attn = generate_path(jnp.asarray(dur, jnp.int32), jnp.asarray(attn_mask))
        dense = np.einsum(
            "bij,bic->bjc", np.asarray(attn, np.float32), np.asarray(mu_x)
        )

        cum = jnp.cumsum(jnp.asarray(dur, jnp.int32), axis=1)
        frames = jnp.arange(yf, dtype=jnp.int32)
        idx = jax.vmap(lambda cc: jnp.searchsorted(cc, frames, side="right"))(cum)
        in_range = (frames[None, :] < cum[:, -1:]).astype(jnp.float32)
        idx = jnp.clip(idx, 0, tx - 1)
        gather = np.asarray(
            jnp.take_along_axis(mu_x, idx[..., None], axis=1)
            * (jnp.asarray(y_fine_mask) * in_range)[..., None]
        )
        np.testing.assert_array_equal(gather, dense)
        # and the dense path really does zero the clamped frame
        assert np.all(dense[0, 1] == 0.0)


def test_pipelined_batcher_output_matches_direct_synthesis(synth):
    """pipeline=2 must not change WHAT is produced, only WHEN: audio for a
    request through the pipelined batcher equals the direct serial
    synthesise_ids result (deterministic per-utterance noise stream).
    Lives here rather than test_batcher.py so the smoke tier stays
    compile-free."""
    from matcha_tpu.serving.batcher import RequestBatcher

    ids = [int(v) for v in np.random.default_rng(9).integers(0, 600, 10)]
    direct = synth.synthesise_ids(ids, speaker=1, n_timesteps=2)

    b = RequestBatcher(synth, max_batch=2, max_wait_ms=5.0, pipeline=2)
    try:
        got = b.submit(ids, speaker=1, n_timesteps=2).result(timeout=300)
    finally:
        b.shutdown()
    np.testing.assert_array_equal(got.wav, direct.wav)
