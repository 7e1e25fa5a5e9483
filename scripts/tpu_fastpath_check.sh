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

echo "== 1/8 fast-path suite vs committed pallas baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_baseline.json \
    --output-dir /tmp/tpu_fastpath_results \
    --no-visualizations

echo "== 2/8 narrow-band production config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config narrow_vertical \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_narrow_baseline.json \
    --output-dir /tmp/tpu_fastpath_narrow \
    --no-visualizations

echo "== 3/8 adaptive-band production config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config adaptive_vertical \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_adaptive_baseline.json \
    --output-dir /tmp/tpu_fastpath_adaptive \
    --no-visualizations

echo "== 4/8 relaxed-order config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config relaxed_order \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_relaxed_baseline.json \
    --output-dir /tmp/tpu_fastpath_relaxed \
    --no-visualizations

echo "== 5/8 production config (adaptive band + relaxed order) vs its baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config production \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_production_baseline.json \
    --output-dir /tmp/tpu_fastpath_production \
    --no-visualizations

echo "== 5b/8 static full-band serving config vs its committed baseline =="
timeout 1500 python -m tpuflow.eval.verifier \
    --backend pallas \
    --pyramid-config production_fullband \
    --compare-baseline \
    --baseline tpuflow/eval/data/pallas_production_fullband_baseline.json \
    --output-dir /tmp/tpu_fastpath_fullband \
    --no-visualizations

echo "== 6/8 VO trajectory suite (pallas front-end) vs its committed baseline =="
timeout 1800 python -m tpuflow.eval.vo_verifier \
    --backend pallas \
    --compare-baseline \
    --baseline tpuflow/eval/data/vo_pallas_baseline.json

echo "== 7/8 packed-gather warp on-device identity (u8 bit-exact, u16 quantization bound) =="
# ADVICE r3: interpret-mode CI cannot catch the Mosaic lane-misalignment
# miscompile class the packed kernels work around; re-verify the
# device-level contracts on real hardware every gate run.
timeout 1500 python - <<'PYEOF'
import numpy as np, jax.numpy as jnp
from tpuflow.kernels import pallas_warp

rng = np.random.default_rng(7)
h, w = 480, 640
imgf = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
imgi = jnp.floor(imgf)
u = jnp.asarray(rng.uniform(-10, 10, (h, w)), jnp.float32)
v = jnp.asarray(rng.uniform(-10, 10, (h, w)), jnp.float32)
for mdv in (8, 3, 2):
    ex = np.asarray(pallas_warp.warp_image_banded(
        imgi, u, v, max_disp=8, max_disp_v=mdv, clamp_flow=True))
    u8 = np.asarray(pallas_warp.warp_image_banded(
        imgi, u, v, max_disp=8, max_disp_v=mdv, clamp_flow=True,
        packed_u8=True))
    assert np.array_equal(ex, u8), f"packed_u8 NOT bit-identical at band {mdv}"
    exf = np.asarray(pallas_warp.warp_image_banded(
        imgf, u, v, max_disp=8, max_disp_v=mdv, clamp_flow=True))
    u16 = np.asarray(pallas_warp.warp_image_banded(
        imgf, u, v, max_disp=8, max_disp_v=mdv, clamp_flow=True,
        packed_u16=True))
    err = np.abs(exf - u16).max()
    assert err <= 1.0 / 256.0 + 1e-5, f"packed_u16 err {err} at band {mdv}"
print("packed warp device identity: OK (u8 bit-exact, u16 <= 1/256)")
PYEOF

echo "== 8/8 tiled-pallas single-chip smoke =="
TPUFLOW_REAL_TPU=1 timeout 900 python -m pytest \
    tests/test_sharding.py::test_tiled_pallas_matches_single_pallas \
    -q --no-header

echo "TPU fast-path check: OK"
