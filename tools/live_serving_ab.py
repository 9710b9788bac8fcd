"""Live serving A/B on the real TPU server: batcher group-size legs.

VERDICT r3 #4: bench's B-scaling table puts the RTF knee at B=16-32, but
serving defaulted to BATCHER_MAX_BATCH=8.  The default is now 16; this
script measures the move on the LIVE server — boots the real HTTP server
(random production-width weights; RTF/throughput are architecture work,
independent of weight values), runs psr/load_test.py legs against it, and
prints one JSON report.

    python tools/live_serving_ab.py | tee /tmp/live_ab.json

Each leg reuses the persistent compilation cache (/tmp/jax_cache), so
only the first boot ever pays the bucket-ladder compiles.  The server is
terminated only when idle (after a leg's load test has fully drained) —
never mid-dispatch, per documentation/dev-notes.md.

Knobs (env): AB_LEGS (max_batch values), AB_FUSED (SERVE_FUSED sweep),
AB_USERS, AB_MINUTES, AB_HEALTH_TIMEOUT (warmup wait, default 3600 s).
TEXT_BUCKETS / MEL_BUCKETS pass through to the server — trim them to the
workload's buckets (the documented ops lever) when the full fused ladder
would exceed the warmup wait; the load test's --ids lengths are 20–110
tokens, i.e. TEXT_BUCKETS=64,128.
"""

from __future__ import annotations

import json
import os
import pickle
import re
import signal
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CKPT = Path(os.environ.get("AB_CKPT", "/tmp/serve_ckpt"))
VOCOS = Path(os.environ.get("AB_VOCOS", "/tmp/serve_vocos.pkl"))
PORT = int(os.environ.get("AB_PORT", "8901"))
MINUTES = float(os.environ.get("AB_MINUTES", "2"))
USERS = tuple(
    int(u) for u in os.environ.get("AB_USERS", "20,50,100").split(",")
)
LEGS = tuple(
    int(b) for b in os.environ.get("AB_LEGS", "8,16").split(",")
)
# second leg dimension: SERVE_FUSED values to sweep (e.g. AB_FUSED=0,1
# with AB_LEGS=16 measures the fused-group dispatch lever live)
FUSED_LEGS = tuple(
    int(f) for f in os.environ.get("AB_FUSED", "0").split(",")
)


def ensure_artifacts():
    """Random production-width checkpoint + vocos pickle, built in a
    CPU-forced subprocess so artifact creation never touches the chip."""
    if (CKPT / "config.json").exists() and VOCOS.exists():
        return
    code = f"""
import pickle, jax
jax.config.update("jax_platforms", "cpu")
from matcha_tpu.models.config import MatchaConfig
from matcha_tpu.models.matcha import init_params
from matcha_tpu.train.checkpoint import save_checkpoint
from matcha_tpu.vocoder.vocos import VocosConfig, init_vocos_params
import json, numpy as np
cfg = MatchaConfig()
params = jax.tree.map(np.asarray, init_params(cfg, jax.random.PRNGKey(0)))
save_checkpoint({str(CKPT)!r}, {{"params": params}}, cfg)
v = jax.tree.map(np.asarray, init_vocos_params(jax.random.PRNGKey(1), VocosConfig()))
with open({str(VOCOS)!r}, "wb") as f:
    pickle.dump(v, f)
print("artifacts ready")
"""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, cwd=str(REPO),
        timeout=900,
    )


def wait_health(
    timeout_s: float = float(os.environ.get("AB_HEALTH_TIMEOUT", "3600")),
) -> float:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with urllib.request.urlopen(
                f"http://localhost:{PORT}/health", timeout=5
            ) as r:
                if r.status == 200:
                    return time.time() - t0
        except Exception:
            pass
        time.sleep(5)
    raise TimeoutError("server never became healthy")


def parse_report(text: str) -> dict:
    out = {}
    m = re.search(r"requests: (\d+) ok, (\d+) errors", text)
    if m:
        out["ok"], out["errors"] = int(m.group(1)), int(m.group(2))
    m = re.search(r"latency p50 (\d+)ms\s+p95 (\d+)ms", text)
    if m:
        out["p50_ms"], out["p95_ms"] = int(m.group(1)), int(m.group(2))
    m = re.search(r"throughput: ([\d.]+) req/s", text)
    if m:
        out["req_per_s"] = float(m.group(1))
    m = re.search(r"service RTF ([\d.]+)", text)
    if m:
        out["service_rtf"] = float(m.group(1))
    return out


def run_leg(max_batch: int, fused: int = 0) -> dict:
    env = dict(
        os.environ,
        CHECKPOINT_PATH=str(CKPT),
        VOCODER_PATH=str(VOCOS),
        PORT=str(PORT),
        SERVE_FUSED=str(fused),
        BATCHER_MAX_BATCH=str(max_batch),
        WARMUP_BATCH_SIZES=",".join(
            str(1 << i) for i in range((max_batch).bit_length())
        ),
        WARMUP_FULL="0",
        # PREPEND the repo: clobbering PYTHONPATH would drop the ambient
        # axon sitecustomize dir that registers the TPU plugin (dev-notes)
        PYTHONPATH=os.pathsep.join(
            p for p in (str(REPO), os.environ.get("PYTHONPATH", "")) if p
        ),
        JAX_CACHE_DIR="/tmp/jax_cache",
    )
    log = open(f"/tmp/server_ab_b{max_batch}_f{fused}.log", "w")
    server = subprocess.Popen(
        [sys.executable, "-m", "matcha_tpu.serving.server"],
        env=env, cwd=str(REPO), stdout=log, stderr=subprocess.STDOUT,
    )
    leg = {"max_batch": max_batch, "fused": fused}
    try:
        leg["warmup_s"] = round(wait_health(), 1)
        for users in USERS:
            proc = subprocess.run(
                [
                    sys.executable, "psr/load_test.py",
                    "--host", f"http://localhost:{PORT}",
                    "--users", str(users), "--minutes", str(MINUTES),
                    "--ids",
                ],
                capture_output=True, text=True, cwd=str(REPO),
                timeout=MINUTES * 60 + 300,
            )
            leg[f"users_{users}"] = parse_report(proc.stdout) or {
                "raw": proc.stdout[-400:], "err": proc.stderr[-400:]
            }
            print(f"  b={max_batch} users={users}: {leg[f'users_{users}']}",
                  file=sys.stderr)
            time.sleep(10)  # drain fully between legs
    finally:
        # the server is idle now (load test joined + drain sleep) — a
        # SIGTERM here interrupts no in-flight device program
        server.send_signal(signal.SIGTERM)
        try:
            server.wait(timeout=60)
        except subprocess.TimeoutExpired:
            server.kill()
        log.close()
    return leg


def main():
    ensure_artifacts()
    report = {"minutes_per_cell": MINUTES, "users": list(USERS), "legs": []}
    for b in LEGS:
        for f in FUSED_LEGS:
            print(f"=== leg max_batch={b} fused={f} ===", file=sys.stderr)
            report["legs"].append(run_leg(b, f))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
