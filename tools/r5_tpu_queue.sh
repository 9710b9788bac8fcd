#!/usr/bin/env bash
# Round-5 TPU measurement queue — strictly serialized (ONE chip, ONE host
# CPU; never two TPU jobs at once, never kill mid-execution: dev-notes.md).
# Run in the background to completion:
#     bash tools/r5_tpu_queue.sh > /tmp/r5_queue.log 2>&1
# Each stage writes its artifact before the next starts, so a partial run
# still leaves usable results.
set -uo pipefail
cd "$(dirname "$0")/.."

mkdir -p documentation/bench_r5_runs

echo "=== [$(date +%T)] bench run 1 (with scaling probe) ==="
BENCH_SCALING=1 timeout 5400 python bench.py > documentation/bench_r5_runs/run1.json
echo "exit=$?"

echo "=== [$(date +%T)] bench run 2 ==="
timeout 3600 python bench.py > documentation/bench_r5_runs/run2.json
echo "exit=$?"

echo "=== [$(date +%T)] bench run 3 ==="
timeout 3600 python bench.py > documentation/bench_r5_runs/run3.json
echo "exit=$?"

echo "=== [$(date +%T)] hardware gate (mas_pallas + attention + tpu_e2e) ==="
timeout 14400 python tools/hw_gate.py --out documentation/hw_gate_r5.json
echo "exit=$?"

echo "=== [$(date +%T)] fast-solver A/B (euler/4, midpoint/2) ==="
timeout 7200 python tools/ab_fast_solvers.py > documentation/ab_fast_solvers_r5.json
echo "exit=$?"

echo "=== [$(date +%T)] live serving A/B: max_batch 16 vs 32, fused default ==="
AB_LEGS=16,32 AB_FUSED=1 AB_USERS=50,100,200 \
    timeout 14400 python tools/live_serving_ab.py > documentation/live_ab_r5.json
echo "exit=$?"

echo "=== [$(date +%T)] queue done ==="
