#!/usr/bin/env bash
# Live TPU utilization/memory (the reference used `watch nvidia-smi`).
watch -n 2 'python -c "
import jax
for d in jax.devices():
    try:
        s = d.memory_stats() or {}
        used = s.get(\"bytes_in_use\", 0) / 2**30
        cap = s.get(\"bytes_limit\", 0) / 2**30
        print(f\"{d}: {used:.2f} / {cap:.2f} GiB\")
    except Exception:
        print(d)
"'
