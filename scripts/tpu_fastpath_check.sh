#!/usr/bin/env bash
# Fast-path (backend="pallas") regression gate — run on a machine with a
# real TPU attached (the CPU interpret-mode tests in CI cannot execute
# pallas inside shard_map, and the fast path's accuracy contract is
# gated against a TPU-captured baseline).
#
# Checks (VERDICT r1 items 4 and 7):
#   1. 13-pattern suite, backend=pallas, vs the committed fast-path
#      baseline (tpuflow/eval/data/pallas_baseline.json) with the same
#      10% regression threshold as the parity gate.
#   2. Single-chip tiled smoke: the shard_map tiled pyramidal fast path
#      (1x1x1 mesh) matches the single-device pallas path.
#
# Analog of the reference's on-board check the CI skips
# (.github/workflows/verify_optical_flow.yml runs only the Python stack;
# RTL needs Vivado + hardware — here the TPU is the "board").

set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"

echo "== 1/7 fast-path suite vs committed pallas baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_baseline.json \
    --output-dir /tmp/tpu_fastpath_results \
    --no-visualizations

echo "== 2/7 narrow-band production config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config narrow_vertical \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_narrow_baseline.json \
    --output-dir /tmp/tpu_fastpath_narrow \
    --no-visualizations

echo "== 3/7 adaptive-band production config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config adaptive_vertical \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_adaptive_baseline.json \
    --output-dir /tmp/tpu_fastpath_adaptive \
    --no-visualizations

echo "== 4/7 relaxed-order config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config relaxed_order \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_relaxed_baseline.json \
    --output-dir /tmp/tpu_fastpath_relaxed \
    --no-visualizations

echo "== 5/7 production config (adaptive band + relaxed order) vs its baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config production \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_production_baseline.json \
    --output-dir /tmp/tpu_fastpath_production \
    --no-visualizations

echo "== 6/7 VO trajectory suite (pallas front-end) vs its committed baseline =="
timeout 1800 python -m tpuflow.eval.vo_verifier \
    --backend pallas \
    --compare-baseline \
    --baseline tpuflow/eval/data/vo_pallas_baseline.json

echo "== 7/7 tiled-pallas single-chip smoke =="
TPUFLOW_REAL_TPU=1 timeout 900 python -m pytest \
    tests/test_sharding.py::test_tiled_pallas_matches_single_pallas \
    -q --no-header

echo "TPU fast-path check: OK"
