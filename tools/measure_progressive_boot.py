"""Measure WARMUP_PROGRESSIVE=1 time-to-healthy on the live TPU server.

Boots the real server (production widths, random weights) with progressive
warmup, records (a) seconds until /health first answers 200, (b) seconds
until the "warming" flag clears (full ladder compiled), and (c) proof that
a request served DURING the warm phase succeeds.  Compare (a) against the
full-warmup boots captured in documentation/live_ab_r4.json (1944 s cold /
1361 s cache-warm legs).

    python tools/measure_progressive_boot.py | tee /tmp/progressive_boot.json
"""

from __future__ import annotations

import json
import os
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
PORT = int(os.environ.get("AB_PORT", "8902"))


def health(timeout=5):
    try:
        with urllib.request.urlopen(
            f"http://localhost:{PORT}/health", timeout=timeout
        ) as r:
            return r.status, json.loads(r.read() or b"{}")
    except Exception:
        return None, {}


def main():
    from tools.live_serving_ab import ensure_artifacts

    ensure_artifacts()
    env = dict(
        os.environ,
        CHECKPOINT_PATH=str(CKPT),
        VOCODER_PATH=str(VOCOS),
        PORT=str(PORT),
        BATCHER_MAX_BATCH="16",
        WARMUP_BATCH_SIZES="1,2,4,8,16",
        WARMUP_PROGRESSIVE="1",
        WARMUP_FULL="0",
        PYTHONPATH=os.pathsep.join(
            p for p in (str(REPO), os.environ.get("PYTHONPATH", "")) if p
        ),
        JAX_CACHE_DIR="/tmp/jax_cache",
    )
    log = open("/tmp/server_progressive.log", "w")
    server = subprocess.Popen(
        [sys.executable, "-m", "matcha_tpu.serving.server"],
        env=env, cwd=str(REPO), stdout=log, stderr=subprocess.STDOUT,
    )
    report = {}
    t0 = time.time()
    try:
        # poll until first 200
        while True:
            code, body = health()
            if code == 200:
                report["healthy_s"] = round(time.time() - t0, 1)
                report["health_body_at_ready"] = body
                break
            if time.time() - t0 > 3600:
                raise TimeoutError("never healthy")
            time.sleep(2)

        # serve a request DURING the warm phase (warming flag still set)
        if body.get("warming"):
            req = urllib.request.Request(
                f"http://localhost:{PORT}/v1/audio/speech",
                data=json.dumps(
                    {"phoneme_ids": [5, 17, 203, 44, 9, 310], "voice": "0",
                     "response_format": "wav"}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            t_req = time.time()
            with urllib.request.urlopen(req, timeout=600) as r:
                audio = r.read()
            report["request_during_warm"] = {
                "status": 200,
                "ms": round((time.time() - t_req) * 1000, 1),
                "bytes": len(audio),
            }

        # poll until the warming flag clears (full ladder done)
        while True:
            code, body = health()
            if code == 200 and not body.get("warming"):
                report["fully_warm_s"] = round(time.time() - t0, 1)
                break
            if time.time() - t0 > 5400:
                report["fully_warm_s"] = None
                break
            time.sleep(5)
    finally:
        server.send_signal(signal.SIGTERM)
        try:
            server.wait(timeout=60)
        except subprocess.TimeoutExpired:
            server.kill()
        log.close()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
