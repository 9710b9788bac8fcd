"""Profiling / tracing helpers (jax.profiler surface).

TPU replacement for the reference's ad-hoc Lightning profilers
(reference: README.md:101-107 — `+trainer.profiler=simple|advanced`):

  * ``trace(logdir)`` — context manager around jax.profiler, producing a
    TensorBoard-viewable XPlane trace of device + host activity
  * ``annotate(name)`` — named ranges visible in the trace
  * ``StageTimer`` — lightweight per-stage wall-time accounting with RTF,
    the same per-synthesis numbers the reference prints (cli.py:122-123)

Enable in training with ``trainer.profile_epochs=N`` or wrap any pipeline
stage manually.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall time per named stage; prints an RTF-style report."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, audio_seconds: float | None = None) -> str:
        lines = []
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            line = f"{name:>20}: {t*1000:8.1f} ms  x{self.counts[name]}"
            if audio_seconds:
                line += f"  (RTF {t/audio_seconds:.4f})"
            lines.append(line)
        if audio_seconds:
            lines.append(f"{'TOTAL':>20}: {total*1000:8.1f} ms  (RTF {total/audio_seconds:.4f})")
        return "\n".join(lines)
