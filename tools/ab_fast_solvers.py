"""Measured A/B of the fast ODE operating points: euler/4 and midpoint/2.

VERDICT r4 item 6: the reference's own validation data says euler/4 is
MCD-equivalent to the production midpoint/4 on a trained checkpoint
(3.94 dB both — reference matcha/utils/mcd_validate.py:83-100), and
euler/4 is HALF the U-Net evals (4 vs 8) on the stage that is 89% of
device time.  This tool measures, on the chip at the bench headline point
(B=16, tx=256, fine-1024, bf16):

  * stage-B DEVICE ms per (solver, steps) — inner-repeat probe
    (utils/probe.py), fixed transport cost cancelled;
  * the mel-space MCD of each fast point vs the midpoint/4 graph at the
    SAME weights/inputs (the hardware-parity distance the on-TPU e2e tier
    uses).  At random weights this measures solver truncation difference,
    not perceptual quality — the trained-artifact equivalence claim rides
    on the reference's own published table; this number is the
    change-detector bar.

The solver/steps are already per-request fields in the serving API
("solver": "euler", "steps": 4 in the POST body), so a fast mode needs no
code change — this publishes the numbers that justify recommending it.

Run ON the chip (background, to completion):
    python tools/ab_fast_solvers.py | tee /tmp/ab_fast_solvers.json
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

B, TX, Y_FINE_LEN = 16, 256, 1024  # bench.py's headline operating point

POINTS = (
    ("midpoint", 4),  # production default: 8 U-Net evals
    ("euler", 4),     # reference-equivalent fast point: 4 evals
    ("midpoint", 2),  # same eval count as euler/4, 2nd-order: 4 evals
    ("euler", 8),     # control: euler at the production eval count
)


def build_synth():
    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    cfg = dataclasses.replace(MatchaConfig(), compute_dtype="bfloat16")
    vcfg = VocosConfig(compute_dtype="bfloat16")
    params = init_params(cfg, jax.random.PRNGKey(0))
    vparams = init_vocos_params(jax.random.PRNGKey(1), vcfg)
    return cfg, MatchaSynthesizer(cfg, params, vparams, vcfg)


def stage_b_inputs(synth):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 600, (B, TX)), jnp.int32)
    x_lengths = jnp.full((B,), TX, jnp.int32)
    spk = jnp.zeros((B, synth.cfg.spk_emb_dim), jnp.float32)
    scale = jnp.ones((B, 1), jnp.float32)
    mu_x, durations, x_mask = synth._encode_jit(
        synth.params, x, x_lengths, spk, spk, scale
    )
    totals = jnp.minimum(
        jnp.sum(durations, axis=1).astype(jnp.int32), Y_FINE_LEN
    )
    return mu_x, durations, x_mask, totals


def probe_decode(synth, inputs, solver, steps, k=4, reps=5):
    from matcha_tpu.utils.probe import inner_repeat

    mu_x, durations, x_mask, totals = inputs

    def body(acc, params, vparams):
        _, wav, _ = synth._decode(
            params, vparams, mu_x + acc, durations, x_mask, totals,
            y_fine_len=Y_FINE_LEN, n_timesteps=steps, solver=solver,
        )
        return jnp.sum(wav.astype(jnp.float32)) * 1e-12

    return inner_repeat(body, synth.params, synth.vocos_params, k=k, reps=reps)


def decode_mel(synth, inputs, solver, steps):
    mu_x, durations, x_mask, totals = inputs
    mel, _, _ = synth._decode_jit(
        synth.params, synth.vocos_params, mu_x, durations, x_mask, totals,
        y_fine_len=Y_FINE_LEN, n_timesteps=steps, solver=solver,
    )
    return np.asarray(mel[0])


def main():
    from matcha_tpu.utils.backend_wait import wait_for_backend

    wait_for_backend()
    from tests.test_tpu_e2e import mel_mcd_db  # same distance as the gate

    t0 = time.time()
    _, synth = build_synth()
    inputs = stage_b_inputs(synth)

    mel_ref = decode_mel(synth, inputs, "midpoint", 4)  # warm + reference
    report = {
        "backend": jax.default_backend(),
        "operating_point": {"B": B, "tx": TX, "y_fine_len": Y_FINE_LEN},
        "reference_point": "midpoint/4 (8 U-Net evals, production default)",
        "points": {},
    }
    for solver, steps in POINTS:
        key = f"{solver}/{steps}"
        mel = decode_mel(synth, inputs, solver, steps)
        probe = probe_decode(synth, inputs, solver, steps)
        report["points"][key] = {
            "unet_evals": steps * (2 if solver == "midpoint" else 1),
            "device_ms": probe["device_ms"],
            "fixed_ms": probe["fixed_ms"],
            "mel_mcd_vs_midpoint4_db": round(mel_mcd_db(mel_ref, mel), 4),
        }
        print(f"[ab-fast] {key}: {report['points'][key]}", file=sys.stderr)
    report["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
