"""Attribute stage B's DEVICE time to its components on the current backend.

Stage B (alignment -> CFM ODE -> Vocos) measures ~41 ms of device compute
at the B=16 headline point (documentation/performance.md).  This tool
splits that across:

    align      prior assembly: duration cumsum -> searchsorted gather ->
               downsample -> masks (the pre-ODE prelude of `_decode`)
    unet_eval  ONE decoder (U-Net) evaluation — the ODE runs 2*steps of
               these (8 at the production midpoint/4 operating point)
    ode        the full 4-step midpoint integration (8 U-Net evals)
    vocos      ConvNeXt backbone + ISTFT head vocoder decode
    stage_b    the complete `_decode` program (sum check)

Device time per component comes from the same inner-repeat method bench.py
uses (jax.profiler's trace RPC hangs through the axon dev tunnel): jit a
variant whose body runs the component K times back-to-back with a
sequential data dependency, then

    device_ms ~= (wall_K - wall_1) / (K - 1)

Usage:
    python tools/profile_stage_b.py [--batch 16] [--tx 256] [--fine 1024]
        [--k 4] [--reps 5] [--components align,unet_eval,ode,vocos,stage_b]

Prints one JSON line.  First run compiles 2 programs per component through
the tunnel (minutes); the persistent cache makes reruns fast.
"""

from __future__ import annotations

import argparse
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


from matcha_tpu.utils.probe import inner_repeat  # noqa: E402  (shared probe)


def main(argv=None):
    import dataclasses

    from matcha_tpu.inference import MatchaSynthesizer
    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.models.decoder import Decoder
    from matcha_tpu.models.matcha import MatchaTTS, init_params
    from matcha_tpu.utils.model_math import downsample_time, sequence_mask
    from matcha_tpu.vocoder.vocos import Vocos, VocosConfig, init_vocos_params

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tx", type=int, default=256)
    p.add_argument("--fine", type=int, default=1024)  # fine mel frames
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--attention_backend", default="auto")
    p.add_argument(
        "--components", default="align,unet_eval,ode,vocos,stage_b"
    )
    args = p.parse_args(argv)

    cfg = dataclasses.replace(
        MatchaConfig(),
        compute_dtype=args.compute_dtype,
        attention_backend=args.attention_backend,
    )
    vcfg = VocosConfig(compute_dtype=args.compute_dtype)
    params = init_params(cfg, jax.random.PRNGKey(0))
    vparams = init_vocos_params(jax.random.PRNGKey(1), vcfg)
    synth = MatchaSynthesizer(cfg, params, vparams, vcfg)
    model = MatchaTTS(cfg)

    b, tx, fine = args.batch, args.tx, args.fine
    coarse = fine // 2
    rng = np.random.default_rng(0)
    # realistic stage-B inputs from a real stage-A run
    x = jnp.asarray(rng.integers(0, 600, (b, tx)), jnp.int32)
    x_lengths = jnp.full((b,), tx, jnp.int32)
    spk = jnp.zeros((b, cfg.spk_emb_dim), jnp.float32)
    scale = jnp.ones((b, 1), jnp.float32)
    mu_x, durations, x_mask = synth._encode_jit(
        synth.params, x, x_lengths, spk, spk, scale
    )
    totals = jnp.minimum(jnp.sum(durations, axis=1).astype(jnp.int32), fine)
    dt = jnp.dtype(args.compute_dtype)
    mu_y = jnp.asarray(rng.standard_normal((b, coarse, cfg.n_feats)), dt)
    y_mask = sequence_mask(
        jnp.full((b,), coarse, jnp.int32), coarse
    ).astype(jnp.float32)
    mel = jnp.asarray(rng.standard_normal((b, coarse, cfg.n_feats)), dt)
    xt = mu_y

    dec = Decoder(cfg=cfg.decoder, out_channels=cfg.n_feats, dtype=dt)
    voc = Vocos(vcfg)

    def align_fn(acc, mu_x, durations, x_mask):
        cum = jnp.cumsum(durations.astype(jnp.int32), axis=1)
        frames = jnp.arange(fine, dtype=jnp.int32)
        idx = jax.vmap(lambda c: jnp.searchsorted(c, frames, side="right"))(cum)
        in_range = (frames[None, :] < cum[:, -1:]).astype(jnp.float32)
        idx = jnp.clip(idx, 0, mu_x.shape[1] - 1)
        mu = jnp.take_along_axis(
            (mu_x + acc).astype(jnp.float32), idx[..., None], axis=1
        )
        yf_mask = sequence_mask(totals, fine).astype(jnp.float32)
        mu = mu * (yf_mask * in_range)[..., None]
        return jnp.sum(downsample_time(mu)) * 1e-12

    def unet_fn(acc, params):
        out = dec.apply(
            {"params": params["decoder"]},
            xt + acc.astype(dt),
            y_mask,
            mu_y,
            jnp.full((b,), 0.5, dt),
            deterministic=True,
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    def ode_fn(acc, params):
        out = model.apply(
            {"params": params},
            mu_y + acc.astype(dt),
            y_mask,
            4,
            "midpoint",
            method=MatchaTTS.decode,
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-12

    def vocos_fn(acc, vparams):
        wav = voc.apply({"params": vparams}, mel + acc.astype(dt))
        return jnp.sum(wav.astype(jnp.float32)) * 1e-12

    # -- sub-U-Net probes: localize the per-eval time ------------------------
    # One production eval runs (channels=(320,320), n_blocks=2, 2 mid):
    #   transformer blocks: 4 @ T=coarse, 8 @ T=coarse/2
    #   resnet blocks:      2 @ T=coarse, 4 @ T=coarse/2
    # so unet_eval ~= 4*tblock_hi + 8*tblock_lo + 2*resnet_hi + 4*resnet_lo
    # + up/down/head convs.
    from matcha_tpu.models.decoder import DecoderTransformerBlock, ResnetBlock1D

    ch = cfg.decoder.channels[0]
    tblock = DecoderTransformerBlock(
        dim=ch,
        num_heads=cfg.decoder.num_heads,
        head_dim=cfg.decoder.attention_head_dim,
        dtype=dt,
        attn_backend=args.attention_backend,
    )
    resblock = ResnetBlock1D(ch, dtype=dt)

    def make_block_probe(block, t_len, with_temb):
        h0 = jnp.asarray(rng.standard_normal((b, t_len, ch)), dt)
        m0 = jnp.ones((b, t_len), jnp.float32)
        temb = jnp.asarray(rng.standard_normal((b, ch * 4)), dt)
        bparams = (
            block.init(jax.random.PRNGKey(2), h0, m0, temb)["params"]
            if with_temb
            else block.init(jax.random.PRNGKey(2), h0, m0)["params"]
        )

        def probe(acc, bp):
            h = h0 + acc.astype(dt)
            out = (
                block.apply({"params": bp}, h, m0, temb)
                if with_temb
                else block.apply({"params": bp}, h, m0)
            )
            return jnp.sum(out.astype(jnp.float32)) * 1e-12

        return probe, (bparams,)

    from matcha_tpu.models.decoder import SnakeBetaFFN
    from matcha_tpu.ops.attention import masked_self_attention

    ffn = SnakeBetaFFN(ch, dtype=dt)

    def make_ffn_probe(t_len):
        h0 = jnp.asarray(rng.standard_normal((b, t_len, ch)), dt)
        fparams = ffn.init(jax.random.PRNGKey(3), h0)["params"]

        def probe(acc, fp):
            out = ffn.apply({"params": fp}, h0 + acc.astype(dt))
            return jnp.sum(out.astype(jnp.float32)) * 1e-12

        return probe, (fparams,)

    def make_sin_probe(t_len):
        """The snake activation's transcendental alone: sin over the FFN's
        (B, T, 4*ch) inner activation."""
        h0 = jnp.asarray(rng.standard_normal((b, t_len, ch * 4)), dt)

        def probe(acc, h):
            out = jnp.square(jnp.sin(h + acc.astype(dt)))
            return jnp.sum(out.astype(jnp.float32)) * 1e-12

        return probe, (h0,)

    def make_ffn_linear_probe(t_len):
        """The FFN's two matmuls with the snake activation skipped —
        isolates the matmul cost from the transcendental cost."""
        h0 = jnp.asarray(rng.standard_normal((b, t_len, ch)), dt)
        w1 = jnp.asarray(rng.standard_normal((ch, ch * 4)) * 0.02, dt)
        w2 = jnp.asarray(rng.standard_normal((ch * 4, ch)) * 0.02, dt)

        def probe(acc, w1, w2):
            h = (h0 + acc.astype(dt)) @ w1
            return jnp.sum((h @ w2).astype(jnp.float32)) * 1e-12

        return probe, (w1, w2)

    def make_attn_probe(t_len):
        nh, hd = cfg.decoder.num_heads, cfg.decoder.attention_head_dim
        q0 = jnp.asarray(rng.standard_normal((b, nh, t_len, hd)), dt)
        m0 = jnp.ones((b, t_len), jnp.float32)

        def probe(acc, q):
            out = masked_self_attention(
                q + acc.astype(dt), q, q, m0,
                backend=args.attention_backend,
            )
            return jnp.sum(out.astype(jnp.float32)) * 1e-12

        return probe, (q0,)

    def stage_b_fn(acc, params, vparams):
        _, wav, _ = synth._decode(
            params, vparams, mu_x + acc, durations, x_mask, totals,
            y_fine_len=fine, n_timesteps=4, solver="midpoint",
        )
        return jnp.sum(wav.astype(jnp.float32)) * 1e-12

    probes = {
        "align": (align_fn, (mu_x, durations, x_mask)),
        "unet_eval": (unet_fn, (synth.params,)),
        "ode": (ode_fn, (synth.params,)),
        "vocos": (vocos_fn, (synth.vocos_params,)),
        "stage_b": (stage_b_fn, (synth.params, synth.vocos_params)),
        "tblock_hi": make_block_probe(tblock, coarse, False),
        "tblock_lo": make_block_probe(tblock, coarse // 2, False),
        "resnet_hi": make_block_probe(resblock, coarse, True),
        "resnet_lo": make_block_probe(resblock, coarse // 2, True),
        "ffn_hi": make_ffn_probe(coarse),
        "ffn_lo": make_ffn_probe(coarse // 2),
        "attn_hi": make_attn_probe(coarse),
        "attn_lo": make_attn_probe(coarse // 2),
        "sin_hi": make_sin_probe(coarse),
        "ffn_linear_hi": make_ffn_linear_probe(coarse),
    }
    want = [c.strip() for c in args.components.split(",") if c.strip()]
    out = {
        "batch": b, "tx": tx, "fine": fine, "coarse": coarse,
        "compute_dtype": args.compute_dtype,
        "attention_backend": args.attention_backend,
        "method": f"inner-repeat k={args.k}",
    }
    for name in want:
        fn, extra = probes[name]
        out[name] = inner_repeat(fn, *extra, k=args.k, reps=args.reps)
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
