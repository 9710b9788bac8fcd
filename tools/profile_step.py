"""Profile the jitted training step on the current backend: wall time vs
DEVICE busy time (jax.profiler XPlane trace).

Usage:
    python tools/profile_step.py [--batch 16] [--tx 128] [--frames 768]
        [--iters 5] [--compute_dtype bfloat16] [--logdir /tmp/step_trace]

Prints one JSON line with wall/device ms per step and the top modules —
the evidence for the device-vs-transport split in
documentation/performance.md.
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


def main(argv=None):
    import dataclasses
    import optax

    from matcha_tpu.models.config import MatchaConfig
    from matcha_tpu.train.step import Batch, init_train_state, make_train_step

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tx", type=int, default=128)
    parser.add_argument("--frames", type=int, default=768)  # coarse mel frames
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--mas_backend", default="auto")
    parser.add_argument("--logdir", default="/tmp/step_trace")
    parser.add_argument(
        "--trace", action="store_true",
        help="capture a jax.profiler XPlane trace (real TPU hosts only — "
        "the profiler RPC hangs through the axon remote transport)",
    )
    parser.add_argument(
        "--device_probe", type=int, default=0, metavar="K",
        help="estimate device ms via an inner-repeat program running the "
        "step K times in one dispatch (extra ~Kx compile)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize each decoder U-Net block in the backward pass "
        "(decoder.remat=True): trades one extra forward for holding a "
        "single block's activations instead of the whole U-Net's",
    )
    parser.add_argument(
        "--memory_only", action="store_true",
        help="AOT lower+compile the step and print the backend's "
        "memory_analysis() (HBM temp/argument/output bytes) WITHOUT "
        "executing — cheap way to compare e.g. --remat on/off",
    )
    parser.add_argument(
        "--mesh", type=int, default=0, metavar="N",
        help="run the step under an N-device data-parallel mesh (N=1 on "
        "the single-chip dev tunnel exercises the mesh code path, incl. "
        "the shard_map Pallas MAS default)",
    )
    args = parser.parse_args(argv)

    cfg = dataclasses.replace(
        MatchaConfig(),
        compute_dtype=args.compute_dtype,
        mas_backend=args.mas_backend,
    )
    if args.remat:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, remat=True)
        )
    mesh = None
    if args.mesh:
        from matcha_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[: args.mesh])
        if cfg.mas_backend == "auto":
            # mirror Trainer's mesh resolution (train/trainer.py)
            backend = (
                "pallas_shard_map"
                if jax.default_backend() == "tpu"
                else "scan"
            )
            cfg = dataclasses.replace(cfg, mas_backend=backend)
        if cfg.mas_backend == "pallas_shard_map":
            from matcha_tpu.ops.mas import set_mas_shard_mesh

            set_mas_shard_mesh(mesh)
    tx_opt = optax.chain(optax.clip_by_global_norm(4.0), optax.adamw(1e-4))
    train_step, _ = make_train_step(cfg, tx_opt, mesh=mesh)
    state = init_train_state(cfg, tx_opt, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    b, t_x, ty = args.batch, args.tx, args.frames
    batch = Batch(
        x=jnp.asarray(rng.integers(0, 600, (b, t_x)), jnp.int32),
        x_lengths=jnp.full((b,), t_x, jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, ty, cfg.n_feats)), jnp.float32),
        y_lengths=jnp.full((b,), ty, jnp.int32),
        y_fine=jnp.asarray(
            rng.standard_normal((b, 2 * ty, cfg.n_feats)), jnp.float32
        ),
        y_fine_lengths=jnp.full((b,), 2 * ty, jnp.int32),
        spks=jnp.asarray(rng.integers(0, cfg.n_spks, (b,)), jnp.int32),
    )
    key = jax.random.PRNGKey(7)

    if args.memory_only:
        # AOT: compile but never execute — memory_analysis() reports the
        # backend's HBM plan (temp = live activations for the backward pass,
        # the number remat is supposed to shrink).
        t0 = time.time()
        compiled = train_step.lower(state, batch, key).compile()
        mb = 1024 * 1024
        try:
            ma = compiled.memory_analysis()
            fields = {
                name.replace("_size_in_bytes", "_mb"): round(
                    getattr(ma, name) / mb, 1
                )
                for name in dir(ma)
                if name.endswith("_size_in_bytes")
                and isinstance(getattr(ma, name, None), int)
            }
        except Exception as exc:  # PJRT plugins may not implement it
            fields = {"error": f"{type(exc).__name__}: {exc}"}
        print(
            json.dumps(
                {
                    "memory_analysis": fields,
                    "compile_s": round(time.time() - t0, 1),
                    "remat": args.remat,
                    "batch": b,
                    "tx": t_x,
                    "coarse_frames": ty,
                    "compute_dtype": args.compute_dtype,
                    "mas_backend": cfg.mas_backend,
                    "backend": jax.default_backend(),
                }
            )
        )
        return

    t0 = time.time()
    state, m = train_step(state, batch, key)  # compile + 1 step
    _ = float(m["loss"])
    print(f"# compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, m = train_step(state, batch, key)
        _ = float(m["loss"])  # force exec + D2H
        times.append(time.perf_counter() - t0)

    device = None
    if args.device_probe > 1:
        import functools

        from jax import lax

        k = args.device_probe

        @functools.partial(jax.jit, static_argnames=("n",))
        def steps_n(st, n):
            def body(_, s):
                s2, _ = train_step(s, batch, key)
                return s2
            return lax.fori_loop(0, n, body, st)

        def timed(n):
            out = steps_n(state, n)  # warmup/compile
            jax.block_until_ready(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(steps_n(state, n))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        w1, wk = timed(1), timed(k)
        dev_ms = (wk - w1) / (k - 1) * 1e3
        device = {
            "device_ms_per_step": round(dev_ms, 3),
            "fixed_overhead_ms": round(w1 * 1e3 - dev_ms, 3),
            "method": f"inner-repeat k={k}",
        }

    if args.trace:
        import shutil

        shutil.rmtree(args.logdir, ignore_errors=True)
        try:
            jax.profiler.start_trace(args.logdir)
            for _ in range(args.iters):
                state, m = train_step(state, batch, key)
                _ = float(m["loss"])
            jax.profiler.stop_trace()
            from matcha_tpu.utils.trace_analysis import device_stats

            stats = device_stats(args.logdir)
            device = {
                **(device or {}),
                "trace_device_ms_per_step": round(
                    stats["device_busy_ms"] / args.iters, 3
                ),
                "top_modules": dict(list(stats["modules"].items())[:5]),
                "planes": stats["device_planes"],
            }
        except Exception as exc:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
            device = {**(device or {}), "trace_error": f"{type(exc).__name__}: {exc}"}

    audio_seconds = b * (ty - 1) * 256 / 24000
    wall = float(np.median(times))
    print(
        json.dumps(
            {
                "wall_ms_per_step": round(wall * 1e3, 3),
                "audio_seconds_per_batch": round(audio_seconds, 1),
                "realtime_x": round(audio_seconds / wall, 1),
                "batch": b,
                "tx": t_x,
                "coarse_frames": ty,
                "compute_dtype": args.compute_dtype,
                "mas_backend": cfg.mas_backend,
                "mesh_devices": args.mesh or None,
                "device": device,
            }
        )
    )


if __name__ == "__main__":
    main()
