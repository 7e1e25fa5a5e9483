"""Smoke-run the scaling MEASUREMENT harness on the virtual CPU mesh.

VERDICT r4 item 5: ``bench_scaling.measure_dp``/``measure_tiled`` had
never executed on more than one device (they exit early on the 1-chip
rig), so the first real pod run would debug the harness and the
hardware at once. Here they run end-to-end on 2/4/8 virtual CPU
devices with small frames — every code path (mesh construction, DP
vmap, tiled shard_map dispatch, the two-length marginal timing loop)
executes; only the absolute numbers are meaningless on CPU.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench_scaling  # noqa: E402

# Small but halo-legal frames: the tiled path asserts tiles exceed
# 2 * (max_disp + 1) = 18 px, and an 8-device mesh tiles as (4, 2).
H, W = 160, 192


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4, 8])
def test_measure_dp_runs(n):
    devices = jax.devices()[:n]
    fps = bench_scaling.measure_dp(devices, h=H, w=W)
    assert np.isfinite(fps) and fps > 0


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 4, 8])
def test_measure_tiled_runs(n):
    devices = jax.devices()[:n]
    fps = bench_scaling.measure_tiled(devices, h=H, w=W)
    # measure_tiled may return None only when the mesh cannot divide the
    # frame — these shapes are chosen so it always can.
    assert fps is not None
    assert np.isfinite(fps) and fps > 0
