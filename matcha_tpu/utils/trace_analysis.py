"""Device-time extraction from jax.profiler XPlane traces.

Splits wall time into DEVICE compute vs everything else (host, dispatch,
transport) — the breakdown the RTF story needs on a remote-tunnel TPU where
wall-clock alone cannot distinguish "chip is busy" from "bytes in flight"
(reference analog: the ad-hoc Lightning profilers, README.md:101-107).

Usage:
    with jax.profiler.trace(logdir):
        ... run N iterations ...
    stats = device_stats(logdir)
    # stats["device_busy_ms"] — total time TPU cores executed XLA programs

Parsing goes through the ``xprof`` package's trace_viewer converter
(Chrome-trace JSON), summing event durations on the device planes' "XLA
Modules" lines — module executions do not overlap on a core, so the sum is
core-busy time.
"""

from __future__ import annotations

import glob
import json
from pathlib import Path


def _find_xplanes(logdir: str | Path) -> list[str]:
    return sorted(
        glob.glob(str(Path(logdir) / "**" / "*.xplane.pb"), recursive=True)
    )


def _trace_events(xplane_path: str) -> list[dict]:
    from xprof.convert import raw_to_tool_data as rtd

    data = rtd.xspace_to_tool_data([xplane_path], "trace_viewer", {})
    if isinstance(data, tuple):  # (payload, content_type) in some versions
        data = data[0]
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    return obj.get("traceEvents", obj if isinstance(obj, list) else [])


def device_stats(logdir: str | Path) -> dict:
    """Aggregate device-side busy time from every xplane under ``logdir``.

    Returns a dict with:
      device_busy_ms   — sum of "XLA Modules" event durations on TPU planes
      modules          — {module_name: {"ms": total, "count": n}}
      wall_span_ms     — first-to-last event span across all planes (the
                         traced region's wall time, host included)
    """
    xplanes = _find_xplanes(logdir)
    if not xplanes:
        raise FileNotFoundError(f"no *.xplane.pb under {logdir}")

    device_pids: set = set()
    proc_names: dict = {}
    thread_names: dict = {}
    events: list[dict] = []
    for xp in xplanes:
        events.extend(_trace_events(xp))

    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            proc_names[ev.get("pid")] = name
            if "TPU" in name.upper() or "/device:" in name:
                device_pids.add(ev.get("pid"))
        elif ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev.get("pid"), ev.get("tid"))] = ev.get("args", {}).get(
                "name", ""
            )

    busy_us = 0.0
    modules: dict[str, dict] = {}
    t_min, t_max = float("inf"), float("-inf")
    for ev in events:
        ts, dur = ev.get("ts"), ev.get("dur")
        if ts is not None:
            t_min = min(t_min, ts)
            if dur:
                t_max = max(t_max, ts + dur)
        if ev.get("ph") not in (None, "X"):
            continue
        if ev.get("pid") not in device_pids or not dur:
            continue
        tname = thread_names.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Modules" not in tname:
            continue
        busy_us += dur
        m = modules.setdefault(ev.get("name", "?"), {"ms": 0.0, "count": 0})
        m["ms"] += dur / 1e3
        m["count"] += 1

    return {
        "device_busy_ms": busy_us / 1e3,
        "modules": {
            k: {"ms": round(v["ms"], 3), "count": v["count"]}
            for k, v in sorted(modules.items(), key=lambda kv: -kv[1]["ms"])
        },
        "wall_span_ms": (t_max - t_min) / 1e3 if t_max > t_min else 0.0,
        "device_planes": sorted(
            proc_names[p] for p in device_pids if p in proc_names
        ),
    }


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("logdir")
    args = parser.parse_args(argv)
    stats = device_stats(args.logdir)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
