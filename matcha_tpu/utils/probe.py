"""Inner-repeat device-time probe — the no-profiler way to split a jitted
program's wall time into device compute vs fixed dispatch overhead.

Jit a variant whose body executes the program under test ``n`` times
back-to-back with a sequential data dependency (iteration i's scalar output
perturbs iteration i+1's input, so XLA cannot overlap or CSE iterations)
and returns only a scalar.  Fixed per-dispatch costs (host work, transport
round-trip, output D2H) are identical between the n=1 and n=k programs, so

    device_ms ~= (wall_k - wall_1) / (k - 1)
    fixed_ms  ~= wall_1 - device_ms

Probe-honesty rule (learned the hard way, documentation/performance.md):
the per-iteration scalar must consume EVERY output of the program in full
(``jnp.sum(out)``) — summing a slice lets XLA dead-code-eliminate the
unmeasured work.

Used by bench.py (stage A/B device breakdown) and tools/profile_stage_b.py
(sub-U-Net attribution); the profiler-based alternative lives in
utils/profiling.py for hosts where the XPlane RPC works.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def inner_repeat(fn, *args, k: int = 4, reps: int = 5) -> dict:
    """Median-timed ``{"device_ms", "fixed_ms"}`` for ``fn``.

    ``fn(acc, *args)`` must consume a scalar ``acc`` (perturbing its inputs
    so XLA cannot CSE iterations) and return a scalar that sums every
    output in full.  ``args`` ride through jit as arguments; anything else
    ``fn`` closes over is baked into the executable as constants.
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def rep(seed, n, *a):
        def body(_, acc):
            return fn(acc, *a)

        return lax.fori_loop(0, n, body, seed)

    def timed(n):
        rep(jnp.float32(0.0), n, *args).block_until_ready()  # warmup/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            rep(jnp.float32(0.0), n, *args).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    w1 = timed(1)
    wk = timed(k)
    dev = (wk - w1) / (k - 1)
    return {
        "device_ms": round(dev * 1e3, 3),
        "fixed_ms": round((w1 - dev) * 1e3, 3),
    }
