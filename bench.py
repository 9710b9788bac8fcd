"""Headline benchmark: batched 24 kHz synthesis RTF per chip.

Measures the full accelerator graph — CFM ODE decode (midpoint, 4 steps →
8 U-Net evals) + Vocos vocoder — on the production model config at a
serving-realistic batch, and reports real-time factor per chip:

    RTF = wall_time / total_audio_seconds        (lower is better)

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

`vs_baseline` compares against the BASELINE.json north-star target of
RTF < 0.01 per chip (values < 1.0 beat the target).  Weights are random —
RTF is architecture/compiler work, independent of weight values.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeated bench runs skip the multi-minute
# first-compile (safe no-op if unsupported by the backend)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    import dataclasses

    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.models.matcha import init_params
    from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params

    # production serving operating point: bf16 activations (the reference
    # serves under torch.autocast bf16 too) with fp32 quality islands
    cfg = dataclasses.replace(MatchaConfig(), compute_dtype="bfloat16")
    vocos_cfg = VocosConfig(compute_dtype="bfloat16")
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocos_params = init_vocos_params(jax.random.PRNGKey(1), vocos_cfg)
    synth = MatchaSynthesizer(cfg, params, vocos_params, vocos_cfg)

    # serving-realistic batch: B utterances x ~5.4 s each (scaling probe on
    # v5e: B=8 -> RTF 0.0013, B=16 -> 0.00086, B=32 -> 0.0008; B=16 is the
    # knee and matches plausible concurrent-request load)
    batch, tx, y_fine_len = 16, 256, 1024
    rng = np.random.default_rng(0)
    iters = 10
    mu_x_all = [
        jnp.asarray(rng.standard_normal((batch, tx, cfg.n_feats)), jnp.float32)
        for _ in range(iters + 1)
    ]
    durations = jnp.full((batch, tx), y_fine_len // tx, jnp.float32)
    x_mask = jnp.ones((batch, tx), jnp.float32)
    y_fine_lengths = jnp.full((batch,), y_fine_len, jnp.int32)

    def run(mu_x):
        mel, wav, _ = synth._decode_jit(
            synth.params,
            synth.vocos_params,
            mu_x,
            durations,
            x_mask,
            y_fine_lengths,
            y_fine_len=y_fine_len,
            n_timesteps=4,
            solver="midpoint",
        )
        return wav

    # warmup/compile, and force full materialization on host
    w = run(mu_x_all[-1])
    _ = float(jnp.sum(w))

    t0 = time.perf_counter()
    checksum = 0.0
    for i in range(iters):
        wav = run(mu_x_all[i])
        # host-side reduction forces device execution + D2H each iteration
        checksum += float(jnp.sum(wav[:, :8]))
    wav.block_until_ready()
    elapsed = (time.perf_counter() - t0) / iters

    coarse_frames = y_fine_len // 2
    audio_seconds = batch * (coarse_frames - 1) * 256 / 24000
    rtf = elapsed / audio_seconds
    target = 0.01  # BASELINE.json north star: RTF < 0.01 per v5e chip

    print(
        json.dumps(
            {
                "metric": "batched_synthesis_rtf_per_chip",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(rtf / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
