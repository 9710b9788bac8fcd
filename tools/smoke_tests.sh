#!/usr/bin/env bash
# Smoke tier: the cheap hermetic suites (~1 min on the 1-CPU dev box) for
# inner-loop work.  The fast tier (pytest -m "not slow") takes ~10 min here;
# full tier runs nightly in CI.  Selection = every suite whose slowest case
# is < ~2 s (measured with --durations; model-forward/trainer/server suites
# are excluded).
#
# Hardware tiers (real TPU, run before a release or kernel change) — one
# command, drops a per-round JSON artifact (documentation/hw_gate_r*.json)
# with the measured on-chip MCDs so the gate's greenness is auditable:
#   python tools/hw_gate.py --out documentation/hw_gate_r5.json
# (equivalently by hand: MATCHA_TESTS_TPU=1 python -m pytest
#  tests/test_mas_pallas.py tests/test_attention.py tests/test_tpu_e2e.py)
set -euo pipefail
cd "$(dirname "$0")/.."

PALLAS_AXON_POOL_IPS= exec python -m pytest -q -m "not slow" \
    tests/test_text_frontend.py \
    tests/test_model_math.py \
    tests/test_utils_tools.py \
    tests/test_mas.py \
    tests/test_mas_pallas.py \
    tests/test_data_pipeline.py \
    tests/test_batcher.py \
    tests/test_codecs.py \
    tests/test_converters.py \
    tests/test_native_loader.py \
    tests/test_mcd_fixtures.py \
    tests/test_corpus_tools.py \
    tests/test_streaming.py \
    "$@"
