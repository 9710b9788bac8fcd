"""On-TPU end-to-end parity tier (``MATCHA_TESTS_TPU=1`` on a TPU host).

The hermetic suite proves every end-to-end numeric claim on the CPU fp32
mesh; this tier gates the FULL production graph on the hardware that
actually serves, at the production operating point (bf16 bodies, fp32
islands, the exact jit programs serving dispatches):

  * full-width bf16 two-stage synthesise vs a CPU fp32 oracle — mel-space
    MCD < 0.1 dB (reference: matcha/inference.py:78-183; the reference's
    quality numbers are all measured on its production device, so ours
    must hold on the TPU, not only on the CPU test mesh)
  * fused single-dispatch output ≡ two-stage output on hardware
  * one full jitted train step (forward + backward + AdamW, Pallas MAS) —
    losses within bf16 tolerance of the CPU fp32 oracle step

Run:  MATCHA_TESTS_TPU=1 python -m pytest tests/test_tpu_e2e.py -q
The first run compiles the production programs through the axon tunnel
(minutes per program); the persistent cache makes repeats fast.

The CPU fp32 oracle runs in a SUBPROCESS with the axon plugin disabled:
once sitecustomize has registered the TPU plugin in this process, env
vars cannot force CPU (documentation/dev-notes.md), and the oracle must
be bit-stable fp32 regardless of the ambient backend.  PRNG draws
(threefry) are backend-deterministic, so the oracle and the device run
see identical noise/timestep draws — the only difference is arithmetic.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

# oracle (__main__) mode runs this file directly — conftest's path insert
# is absent there
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# production-width operating point, small utterance/batch so the CPU fp32
# oracle stays tractable on a 1-core host
N_TOKENS = 40
TRAIN_B, TRAIN_TX, TRAIN_TY = 4, 32, 64

# Measured-on-hardware tolerance bars (decomposed; measured values and
# rationale in documentation/performance.md "On-TPU end-to-end parity"):
#
#   fp32-on-TPU vs fp32-on-CPU isolates BACKEND arithmetic (XLA:TPU vs
#   XLA:CPU op orderings) — this is the graph-faithfulness claim and
#   carries the strict 0.1 dB bar.
#
#   bf16-on-TPU vs the fp32 oracle additionally carries the production
#   mixed-precision regime (bf16 matmul/conv inputs, autocast-style fp32
#   carry — models/config.py fp32_residual).  At RANDOM weights the
#   4-step midpoint ODE (8 U-Net evals) amplifies per-matmul bf16
#   rounding far more than a trained (contractive, denoising) network
#   does; measured 0.18 dB here, vs 0.19-0.22 before the fp32-carry fix
#   and ~0.08 for the SAME bf16 graph merely recompiled in a different
#   fusion order (the fused/two-stage gap below) — i.e. most of the bf16
#   number is rounding noise floor, not systematic drift.
MEL_MCD_FP32_BAR_DB = 0.1   # graph faithfulness: TPU fp32 vs CPU oracle
MEL_MCD_BF16_BAR_DB = 0.3   # production bf16 point (measured 0.179 r4)
FUSED_MCD_BAR_DB = 0.15     # fused vs two-stage: same graph, same dtype,
                            # different XLA fusion (measured 0.009-0.079)
TRAIN_LOSS_RTOL = 0.05      # bf16 bodies vs fp32 oracle, same rng draws


def _oracle_env() -> dict:
    env = dict(os.environ)
    # clearing the pool is what actually keeps the subprocess off the
    # tunnel; JAX_PLATFORMS alone is ignored once the plugin registers
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("MATCHA_TESTS_TPU", None)
    env.setdefault("OMP_NUM_THREADS", "1")
    return env


def _phoneme_ids() -> list[int]:
    rng = np.random.default_rng(17)
    return [int(v) for v in rng.integers(1, 599, size=N_TOKENS)]


def _train_batch():
    """Fixed ragged training batch at production widths (normalized-mel
    space, shapes respecting the U-Net's downsample divisibility)."""
    from matcha_tpu.train.step import Batch

    rng = np.random.default_rng(23)
    x = rng.integers(1, 599, (TRAIN_B, TRAIN_TX)).astype(np.int32)
    x_lengths = np.asarray([32, 20, 26, 16], np.int32)
    y = rng.standard_normal((TRAIN_B, TRAIN_TY, 100)).astype(np.float32)
    y_lengths = np.asarray([64, 48, 56, 40], np.int32)
    y_fine = rng.standard_normal((TRAIN_B, 2 * TRAIN_TY, 100)).astype(
        np.float32
    )
    for k in range(TRAIN_B):
        x[k, x_lengths[k]:] = 0
        y[k, y_lengths[k]:] = 0.0
        y_fine[k, 2 * y_lengths[k]:] = 0.0
    spks = np.asarray([0, 3, 7, 12], np.int32)
    return Batch(
        x, x_lengths, y, y_lengths, y_fine, (2 * y_lengths).astype(np.int32),
        spks,
    )


def _build(compute_dtype: str):
    """Production-config model + synthesizer at the given compute dtype,
    weights seeded identically everywhere (threefry is backend-stable)."""
    import dataclasses

    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    cfg = dataclasses.replace(MatchaConfig(), compute_dtype=compute_dtype)
    vcfg = VocosConfig(compute_dtype=compute_dtype)
    params = init_params(
        dataclasses.replace(cfg, compute_dtype="float32"),
        jax.random.PRNGKey(0),
    )
    vparams = init_vocos_params(
        jax.random.PRNGKey(1), VocosConfig(compute_dtype="float32")
    )
    synth = MatchaSynthesizer(cfg, params, vparams, vcfg)
    return cfg, synth


def _one_train_step(cfg, params):
    """One full jitted train step (the production program: clip + AdamW +
    nonfinite guard) on the ambient backend; returns the metrics dict.

    ``params`` is pulled to host first: the jitted step donates its state
    argument, and donating the synthesizer's live device buffers would
    invalidate them for every later test — fresh uploads are donated
    instead (one H2D of ~120 MB, cheap next to the compile)."""
    from matcha_tpu.train.optim import OptimizerConfig, build_optimizer
    from matcha_tpu.train.step import TrainState, make_train_step

    host_params = jax.device_get(params)
    tx = build_optimizer(OptimizerConfig())
    state = TrainState(
        params=host_params,
        opt_state=tx.init(host_params),
        step=np.zeros((), np.int32),
    )
    train_jit, _ = make_train_step(cfg, tx)
    batch = _train_batch()
    new_state, metrics = train_jit(state, batch, jax.random.PRNGKey(5))
    out = {k: float(np.asarray(v)) for k, v in metrics.items()}
    # one params-delta scalar so the oracle also pins the UPDATE, not just
    # the loss (optimizer math is fp32 on both sides); device_get pulls the
    # whole tree in one transfer (per-leaf pulls are minutes on the tunnel)
    new_host = jax.device_get(new_state.params)
    out["update_l1"] = float(
        sum(
            np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).sum()
            for a, b in zip(
                jax.tree_util.tree_leaves(new_host),
                jax.tree_util.tree_leaves(host_params),
            )
        )
    )
    return out


def write_oracle(path: str):
    """CPU fp32 oracle: synthesis outputs + one-train-step metrics."""
    jax.config.update("jax_platforms", "cpu")
    cfg, synth = _build("float32")
    res = synth.synthesise_ids(_phoneme_ids(), speaker=2, debug=True)
    params = jax.device_get(synth.params)
    train_metrics = _one_train_step(cfg, synth.params)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "backend": jax.default_backend(),
                "wav": np.asarray(res.wav),
                "mel": np.asarray(res.mel),
                "durations": np.asarray(res.durations),
                "train_metrics": train_metrics,
                "params_fingerprint": float(
                    sum(
                        np.abs(np.asarray(l, np.float64)).sum()
                        for l in jax.tree_util.tree_leaves(params)
                    )
                ),
            },
            f,
        )
    print(f"oracle written: {path} backend={jax.default_backend()}")


def mel_mcd_db(mel_a: np.ndarray, mel_b: np.ndarray, n_coeffs: int = 13) -> float:
    """Mel-space MCD (dB) between two denormalized ln-mel matrices — DCT
    cepstra (c0 dropped) + DTW, the same distance family as utils/mcd but
    on the model's OWN mel output, so the vocoder (random weights here)
    cannot launder or amplify the difference under test."""
    from scipy.fft import dct

    from matcha_tpu.utils.mcd import DYNAMIC_RANGE_NAT, MCD_CONST, dtw_path_cost

    ceps = []
    for mel in (mel_a, mel_b):
        mel = np.asarray(mel, np.float64)
        mel = np.maximum(mel, mel.max() - DYNAMIC_RANGE_NAT)
        c = dct(mel, type=2, axis=-1, norm="ortho")
        ceps.append(c[:, 1 : n_coeffs + 1])
    return float(MCD_CONST * dtw_path_cost(*ceps))


@pytest.fixture(scope="session")
def oracle(tmp_path_factory):
    if jax.default_backend() != "tpu":
        pytest.skip("on-TPU tier: needs real TPU (MATCHA_TESTS_TPU=1)")
    path = tmp_path_factory.mktemp("tpu_e2e") / "oracle.pkl"
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "--oracle", str(path)],
        env=_oracle_env(),
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, (
        f"CPU oracle failed:\n{proc.stdout}\n{proc.stderr}"
    )
    with open(path, "rb") as f:
        data = pickle.load(f)
    assert data["backend"] == "cpu", "oracle must be CPU fp32"
    return data


@pytest.fixture(scope="session")
def tpu_synth(oracle):
    cfg, synth = _build("bfloat16")
    # same seeded weights on both sides — pin it, or every comparison
    # below is meaningless.  device_get pulls the tree in ONE transfer
    # (the process's first D2H is the slow lazy relay sync; per-leaf
    # pulls would pay tunnel round-trips ~300 times over)
    host = jax.device_get(synth.params)
    fp = float(
        sum(
            np.abs(np.asarray(l, np.float64)).sum()
            for l in jax.tree_util.tree_leaves(host)
        )
    )
    np.testing.assert_allclose(
        fp, oracle["params_fingerprint"], rtol=1e-6,
        err_msg="TPU init diverged from the CPU oracle's weights",
    )
    return cfg, synth


class TestSynthesiseParity:
    """Full production-width synthesise on the chip vs the fp32 oracle,
    through the EXACT serving programs (_encode_jit / _decode_jit)."""

    def test_fp32_graph_faithful_on_tpu(self, oracle):
        """TPU fp32 vs CPU fp32: backend arithmetic only — the strict bar.

        default_matmul_precision("highest") is required for this claim to
        be about the BACKEND: at JAX's DEFAULT precision a TPU fp32 matmul
        truncates its inputs to single-pass bf16 on the MXU (measured here:
        0.157 dB at DEFAULT — nearly the full bf16 gap), which would test
        the precision mode, not the graph."""
        _, synth = _build("float32")
        with jax.default_matmul_precision("highest"):
            res = synth.synthesise_ids(_phoneme_ids(), speaker=2, debug=True)
        assert len(res.wav) == len(oracle["wav"]), "fp32 duration drift"
        mcd = mel_mcd_db(oracle["mel"], res.mel)
        print(f"\n[tpu-e2e] two-stage fp32 vs fp32 oracle: mel MCD {mcd:.4f} dB")
        assert mcd < MEL_MCD_FP32_BAR_DB, f"TPU fp32 mel MCD {mcd:.4f} dB"

    def test_two_stage_mel_mcd(self, oracle, tpu_synth):
        _, synth = tpu_synth
        res = synth.synthesise_ids(_phoneme_ids(), speaker=2, debug=True)
        # duration rounding may flip ±1 frame under bf16; the DTW distance
        # absorbs that, but a large length drift would mean broken pacing
        assert (
            abs(len(res.wav) - len(oracle["wav"]))
            <= 0.05 * max(len(oracle["wav"]), 1) + 2 * 256
        )
        mcd = mel_mcd_db(oracle["mel"], res.mel)
        print(f"\n[tpu-e2e] two-stage bf16 vs fp32 oracle: mel MCD {mcd:.4f} dB")
        assert mcd < MEL_MCD_BF16_BAR_DB, f"bf16-on-TPU mel MCD {mcd:.4f} dB"

    def test_durations_match_oracle(self, oracle, tpu_synth):
        _, synth = tpu_synth
        res = synth.synthesise_ids(_phoneme_ids(), speaker=2, debug=True)
        a = np.asarray(oracle["durations"], np.float64)
        b = np.asarray(res.durations, np.float64)
        assert a.shape == b.shape
        # integer fine-frame durations: identical for all but rounding-edge
        # tokens, and never off by more than one frame
        assert np.max(np.abs(a - b)) <= 1.0
        assert np.mean(a != b) <= 0.15

    def test_fused_matches_two_stage_on_hardware(self, tpu_synth):
        _, synth = tpu_synth
        two = synth.synthesise_ids(_phoneme_ids(), speaker=2)
        fused = synth.synthesise_ids(_phoneme_ids(), speaker=2, fused=True)
        assert len(two.wav) == len(fused.wav), "duration drift between paths"
        from matcha_tpu.utils.mcd import mcd_dtw

        mcd = mcd_dtw(two.wav, fused.wav, basis="mel")
        print(f"\n[tpu-e2e] fused vs two-stage on hardware: MCD {mcd:.4f} dB")
        assert mcd < FUSED_MCD_BAR_DB, f"fused vs two-stage MCD {mcd:.4f} dB"


class TestTrainStepParity:
    """One full production train step on the chip (bf16 bodies, Pallas MAS
    via mas_backend=auto) vs the CPU fp32 oracle step — same rng key, so
    the t/noise/dropout draws are identical and only arithmetic differs."""

    def test_losses_within_bf16_tolerance(self, oracle, tpu_synth):
        cfg, synth = tpu_synth
        metrics = _one_train_step(cfg, synth.params)
        ref = oracle["train_metrics"]
        for key in ("loss", "sub_loss/diff", "sub_loss/dur", "sub_loss/prior"):
            assert np.isfinite(metrics[key]), f"{key} non-finite on TPU"
            np.testing.assert_allclose(
                metrics[key], ref[key], rtol=TRAIN_LOSS_RTOL, err_msg=key
            )
        assert np.isfinite(metrics["grad_norm"])
        # the applied update must be the same order of magnitude — a blown
        # bf16 gradient would show up here even if the loss agreed
        np.testing.assert_allclose(
            metrics["update_l1"], ref["update_l1"], rtol=0.10
        )


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--oracle", required=True)
    args = parser.parse_args()
    write_oracle(args.oracle)
