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
