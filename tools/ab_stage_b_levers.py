"""Measured A/B of the two candidate stage-B device-time levers.

VERDICT r3 #7: stage-B device time is 89% U-Net evals with no single hot
kernel (documentation/performance.md "Where the time goes"), so wins can
only come from cheap broad levers.  This tool measures the two the
analysis suggests, with the inner-repeat probe (utils/probe.py):

  (a) bf16 norm statistics — flax promotes every GroupNorm/LayerNorm
      mean/var reduction to fp32 (`force_float32_reductions`); the
      `DecoderConfig.bf16_norm_stats=True` option keeps them in the
      compute dtype.  Reports device ms AND the mel cost (MCD vs the
      fp32-stats baseline) so the quality gate is part of the decision.
  (b) conv layout audit — the decoder's convs run in flax's NWC
      (feature-minor) layout; this times the SAME convolutions in NCW via
      lax.conv_general_dilated dimension_numbers at the production
      shapes, to check whether XLA's TPU conv emitter prefers the other
      layout for channels 320-640 / kernel 3 / seq 256-512.

Run ON the chip (background, to completion):
    python tools/ab_stage_b_levers.py | tee /tmp/ab_levers.json

Accept/reject rule: a lever ships only if device_ms improves beyond the
probe's noise (~0.05 ms) AND (for (a)) the on-TPU parity tier stays
under its MCD bar with the flag on.
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
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

B, TX, Y_FINE_LEN = 16, 256, 1024  # bench.py's headline operating point


def build_synth(bf16_norm_stats: bool = False, fp32_residual: bool = True):
    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    cfg = dataclasses.replace(MatchaConfig(), compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(
            cfg.decoder,
            bf16_norm_stats=bf16_norm_stats,
            fp32_residual=fp32_residual,
        ),
        encoder=dataclasses.replace(cfg.encoder, fp32_residual=fp32_residual),
    )
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


def probe_decode(synth, inputs, k=4, reps=5):
    from matcha_tpu.utils.probe import inner_repeat

    mu_x, durations, x_mask, totals = inputs

    def body(acc, params, vparams):
        _, wav, _ = synth._decode(
            params, vparams, mu_x + acc, durations, x_mask, totals,
            y_fine_len=Y_FINE_LEN, n_timesteps=4, solver="midpoint",
        )
        return jnp.sum(wav.astype(jnp.float32)) * 1e-12

    return inner_repeat(body, synth.params, synth.vocos_params, k=k, reps=reps)


def decode_mel(synth, inputs):
    mu_x, durations, x_mask, totals = inputs
    mel, _, _ = synth._decode_jit(
        synth.params, synth.vocos_params, mu_x, durations, x_mask, totals,
        y_fine_len=Y_FINE_LEN, n_timesteps=4, solver="midpoint",
    )
    return np.asarray(mel[0])


def lever_a():
    """bf16 norm stats: device time + mel cost vs the fp32-stats default."""
    _, base = build_synth()
    inputs = stage_b_inputs(base)
    mel_base = decode_mel(base, inputs)  # warm + quality reference
    t_base = probe_decode(base, inputs)

    _, variant = build_synth(bf16_norm_stats=True)
    mel_var = decode_mel(variant, inputs)
    t_var = probe_decode(variant, inputs)

    from tests.test_tpu_e2e import mel_mcd_db  # same distance as the gate

    return {
        "baseline_device_ms": t_base["device_ms"],
        "bf16_stats_device_ms": t_var["device_ms"],
        "delta_ms": round(t_var["device_ms"] - t_base["device_ms"], 3),
        "mel_mcd_vs_baseline_db": round(mel_mcd_db(mel_base, mel_var), 4),
    }


def lever_c():
    """Cost of the autocast fp32 carry (the r4 quality fix): device time
    of stage B with fp32_residual on (production default) vs the legacy
    all-bf16 carry, plus the mel gap — quantifies what the parity-grade
    numerics cost in device ms."""
    _, on = build_synth(fp32_residual=True)
    inputs = stage_b_inputs(on)
    mel_on = decode_mel(on, inputs)
    t_on = probe_decode(on, inputs)

    _, off = build_synth(fp32_residual=False)
    mel_off = decode_mel(off, inputs)
    t_off = probe_decode(off, inputs)

    from tests.test_tpu_e2e import mel_mcd_db

    return {
        "fp32_carry_device_ms": t_on["device_ms"],
        "bf16_carry_device_ms": t_off["device_ms"],
        "delta_ms": round(t_on["device_ms"] - t_off["device_ms"], 3),
        "mel_mcd_carry_gap_db": round(mel_mcd_db(mel_on, mel_off), 4),
    }


def _conv_probe(fn, x, w, k=8, reps=5):
    """Device time of ONE conv call via an amplified inner-repeat chain."""
    from matcha_tpu.utils.probe import inner_repeat

    def body(acc, xx, ww):
        out = fn(xx + acc.astype(xx.dtype), ww)
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    r = inner_repeat(body, x, w, k=k, reps=reps)
    return r["device_ms"]


def lever_b():
    """NWC (flax/current) vs NCW conv layouts at decoder shapes, bf16."""
    rng = np.random.default_rng(1)
    cases = [
        # (name, B, T, Cin, Cout, kernel, stride)
        ("body_conv3_c320_t512", B, 512, 320, 320, 3, 1),
        ("body_conv3_c320_t256", B, 256, 320, 320, 3, 1),
        ("down_conv3_s2_c320_t512", B, 512, 320, 320, 3, 2),
        ("wide_conv3_c640_t256", B, 256, 640, 640, 3, 1),
    ]
    out = {}
    for name, b, t, cin, cout, kk, stride in cases:
        x_nwc = jnp.asarray(
            rng.standard_normal((b, t, cin)), jnp.bfloat16
        )
        w_hio = jnp.asarray(
            rng.standard_normal((kk, cin, cout)) * 0.02, jnp.bfloat16
        )
        x_ncw = jnp.transpose(x_nwc, (0, 2, 1))
        w_oiw = jnp.transpose(w_hio, (2, 1, 0))

        def nwc(xx, ww, s=stride):
            return lax.conv_general_dilated(
                xx, ww, (s,), "SAME", dimension_numbers=("NHC", "HIO", "NHC")
            )

        def ncw(xx, ww, s=stride):
            return lax.conv_general_dilated(
                xx, ww, (s,), "SAME", dimension_numbers=("NCH", "OIH", "NCH")
            )

        out[name] = {
            "nwc_ms": _conv_probe(nwc, x_nwc, w_hio),
            "ncw_ms": _conv_probe(ncw, x_ncw, w_oiw),
        }
    return out


def main():
    from matcha_tpu.utils.backend_wait import wait_for_backend

    wait_for_backend()
    t0 = time.time()
    report = {
        "backend": jax.default_backend(),
        "operating_point": {"B": B, "tx": TX, "y_fine_len": Y_FINE_LEN},
        "lever_a_bf16_norm_stats": lever_a(),
        "lever_b_conv_layout": lever_b(),
        "lever_c_fp32_carry_cost": lever_c(),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
