"""Smoke the bench.py measurement machinery on a tiny CPU config.

The real bench runs production widths on the TPU chip; these tests prove
the harness itself (measure loops, JSON fields, profiler-trace parsing)
works, so a driver bench run can't die on harness bugs.
"""

import dataclasses

import jax
import numpy as np
import pytest

import bench
from matcha_tpu.inference import MatchaSynthesizer
from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import init_params


@pytest.fixture(scope="module")
def synth():
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    vcfg = VocosConfig(
        input_channels=cfg.n_feats, dim=16, intermediate_dim=32,
        num_layers=2, n_fft=64, hop_length=16,
    )
    vparams = init_vocos_params(jax.random.PRNGKey(1), vcfg)
    return cfg, MatchaSynthesizer(cfg, params, vparams, vcfg)


@pytest.mark.slow
def test_measure_and_trace_fields(synth, tmp_path):
    cfg, s = synth
    point = bench.measure(
        s, cfg, batch=2, iters=2, with_flops=True, tx=16, y_fine_len=64
    )
    assert point["batch"] == 2
    assert point["encoder_ms"] > 0 and point["decode_vocoder_ms"] > 0
    assert point["rtf"] > 0 and point["audio_seconds"] > 0
    assert np.isfinite(point.get("flops", 0.0))

    dev = bench.device_breakdown(point, iters=2, logdir=str(tmp_path / "tr"))
    assert dev is not None
    # on the CPU test backend there are no TPU planes — the parse must
    # still succeed and report wall times (or a structured error, never a
    # crash); on real TPU the device_* fields become meaningful
    if "error" not in dev:
        assert dev["wall_encode_ms"] > 0 and dev["wall_decode_ms"] > 0
        assert dev["device_encode_ms"] >= 0


@pytest.mark.slow
def test_device_probe_inner_repeat(synth):
    """The inner-repeat probe compiles, runs, and yields finite stage
    estimates (on CPU the 'device' time is just CPU compute — the math
    still must hold: wall_k > wall_1 implies positive per-iter time)."""
    cfg, s = synth
    point = bench.measure(s, cfg, batch=2, iters=2, tx=16, y_fine_len=64)
    dev = bench.device_probe(s, point, k=3, reps=2)
    assert np.isfinite(dev["device_encode_ms"])
    assert np.isfinite(dev["device_decode_ms"])
    assert dev["device_decode_ms"] > 0


@pytest.mark.slow
def test_measure_fused_fields(synth):
    """The fused-path latency probe runs the single-dispatch program and
    reports a positive wall time and the predicted mel bucket."""
    cfg, s = synth
    point = bench.measure_fused(s, cfg, batch=1, iters=2, tx=16)
    assert point["batch"] == 1
    assert point["total_ms"] > 0 and point["rtf"] > 0
    assert point["y_fine_len"] in s.mel_fine_buckets


@pytest.mark.slow
def test_measure_fused_batched_headline_point(synth):
    """The headline point: fused single-dispatch at batch with the mel
    bucket PINNED to the two-stage comparison bucket, so the audio
    accounting is identical, plus the FLOP count for the MFU estimate."""
    cfg, s = synth
    point = bench.measure_fused(
        s, cfg, batch=2, iters=2, tx=16, y_fine_len=64, with_flops=True
    )
    assert point["batch"] == 2
    assert point["y_fine_len"] == 64  # pinned, not predicted
    assert point["total_ms"] > 0 and point["rtf"] > 0
    assert np.isfinite(point.get("flops", 0.0))
    # same audio accounting as bench.measure at the same (batch, bucket):
    # assert each probe's denominator against the SHARED formula directly —
    # reconstructing it as rounded total_ms / unrounded rtf can exceed a
    # relative tolerance at sub-ms elapsed times on a fast CPU
    audio_s = 2 * (64 // 2 - 1) * 256 / 24000
    two = bench.measure(s, cfg, batch=2, iters=2, tx=16, y_fine_len=64)
    for p in (point, two):
        # total_ms is rounded to 3 decimals; rtf * audio_s is the unrounded
        # elapsed seconds — they must agree to the rounding quantum
        assert abs(p["rtf"] * audio_s * 1e3 - p["total_ms"]) <= 5.1e-4


def test_pick_headline_selection():
    """Fused point wins the headline only when it measured cleanly; error
    dicts and BENCH_FUSED=0 (None) fall back to the two-stage point."""
    peak = bench.V5E_PEAK_FLOPS
    ok = {"rtf": 0.001, "total_ms": 90.0, "flops": 9e11}
    rtf, path, mfu, src = bench.pick_headline(0.00126, 9e11, 110.0, dict(ok))
    assert (rtf, path, src) == (0.001, "fused_single_dispatch_b16", "fused")
    assert abs(mfu - 9e11 / 0.090 / peak) < 1e-9

    for bad in (None, {"error": "XlaRuntimeError: boom"}):
        rtf, path, mfu, src = bench.pick_headline(0.00126, 9e11, 110.0, bad)
        assert (rtf, path, src) == (0.00126, "two_stage_b16", "two_stage")
        assert abs(mfu - 9e11 / 0.110 / peak) < 1e-9

    # fused measured but cost-analysis unavailable: MFU falls back to the
    # two-stage FLOP count over the fused time, and the source label says so
    rtf, path, mfu, src = bench.pick_headline(
        0.00126, 9e11, 110.0, {"rtf": 0.001, "total_ms": 90.0, "flops": 0.0}
    )
    assert path == "fused_single_dispatch_b16"
    assert src == "two_stage"
    assert abs(mfu - 9e11 / 0.090 / peak) < 1e-9


class TestWaitForBackend:
    """Hermetic coverage of the bench/entry backend-wait retry loop."""

    def _fake_run(self, results):
        """subprocess.run stub popping canned (returncode, stderr) pairs."""
        import subprocess

        calls = []

        def run(cmd, capture_output=True, timeout=None):
            calls.append(cmd)
            rc, err = results.pop(0)
            if rc is None:
                raise subprocess.TimeoutExpired(cmd, timeout)
            return subprocess.CompletedProcess(cmd, rc, stdout=b"", stderr=err)

        return run, calls

    def test_returns_once_probe_succeeds(self, monkeypatch):
        from matcha_tpu.utils import backend_wait

        run, calls = self._fake_run([(1, b"UNAVAILABLE: grant wedged"), (0, b"")])
        monkeypatch.setattr(backend_wait.subprocess, "run", run)
        monkeypatch.setattr(backend_wait.time, "sleep", lambda s: None)
        monkeypatch.setenv("BENCH_WAIT_BACKEND_S", "900")
        backend_wait.wait_for_backend()
        assert len(calls) == 2

    def test_budget_exhaustion_returns_instead_of_raising(self, monkeypatch):
        from matcha_tpu.utils import backend_wait

        # every probe fails (incl. a hang); a fake clock burns the budget
        run, calls = self._fake_run([(1, b"err"), (None, None), (1, b"err")])
        clock = iter([0.0, 1.0, 50.0, 200.0])
        monkeypatch.setattr(backend_wait.subprocess, "run", run)
        monkeypatch.setattr(backend_wait.time, "sleep", lambda s: None)
        monkeypatch.setattr(backend_wait.time, "time", lambda: next(clock))
        monkeypatch.setenv("BENCH_WAIT_BACKEND_S", "100")
        backend_wait.wait_for_backend()  # must return, not raise
        assert len(calls) >= 2

    def test_zero_budget_disables_probing(self, monkeypatch):
        from matcha_tpu.utils import backend_wait

        def boom(*a, **k):  # pragma: no cover - must never run
            raise AssertionError("probe ran despite 0 budget")

        monkeypatch.setattr(backend_wait.subprocess, "run", boom)
        monkeypatch.setenv("BENCH_WAIT_BACKEND_S", "0")
        backend_wait.wait_for_backend()
