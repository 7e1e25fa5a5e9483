"""S8.7 fixed-point (RTL-equivalent) mode tests.

Ring-3 analog of the reference's RTL testbench checks
(tb/tb_optical_flow_top.sv:42-45,303-327): statistical assertions over
the textured test region on the natural 2 px-shift frames, plus the
published cross-implementation numbers (reference README.md:386-395).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tpuflow.eval import natural
from tpuflow.kernels import fixed_point
from tpuflow.flow import lucas_kanade_single_scale


@pytest.fixture(scope="module")
def natural_pair():
    return natural.generate_pair(320, 240, dx=2.0, dy=0.0)


def test_frames_match_committed_tb_frames(natural_pair):
    """Our generator reproduces the reference's committed TB frames
    bit-for-bit (tb/test_frames/frame_00/01.mem)."""
    from tpuflow.io import load_frame_mem

    ref_dir = "/root/reference/tb/test_frames"
    import os

    if not os.path.exists(f"{ref_dir}/frame_00.mem"):
        pytest.skip("reference TB frames unavailable")
    f0, f1 = natural_pair
    r0 = load_frame_mem(f"{ref_dir}/frame_00.mem").astype(np.uint8)
    r1 = load_frame_mem(f"{ref_dir}/frame_01.mem").astype(np.uint8)
    np.testing.assert_array_equal(f0, r0)
    np.testing.assert_array_equal(f1, r1)


def test_rtl_testbench_criteria(natural_pair):
    """The RTL TB's pass criteria on the 2 px rightward-motion frames
    (tb_optical_flow_top.sv:295-307): sqrt(mean_u^2 + mean_v^2) >= 0.5
    px and |mean_v| < 0.5 px in region x[55:85], y[105:135]."""
    f0, f1 = natural_pair
    u, v = fixed_point.lucas_kanade_s87(jnp.asarray(f0), jnp.asarray(f1))
    region = np.s_[105:135, 55:85]
    mean_u = float(np.asarray(u)[region].mean())
    mean_v = float(np.asarray(v)[region].mean())
    mag = np.sqrt(mean_u**2 + mean_v**2)
    assert mag >= 0.5, mag
    assert abs(mean_v) < 0.5, mean_v


def test_fixed_point_underestimates_float(natural_pair):
    """Cross-implementation ladder on the committed TB frames: ground
    truth 2.0 > float single-scale > S8.7 integer datapath. (The
    reference README's 1.34/0.767 figures predate the committed frame
    set — its own golden model run today gives mean u = 1.181 on these
    frames; the integer datapath lands just below the float one.)"""
    f0, f1 = natural_pair
    region = np.s_[105:135, 55:85]

    uf, _ = lucas_kanade_single_scale(
        jnp.asarray(f0, jnp.float32), jnp.asarray(f1, jnp.float32)
    )
    u8, _ = fixed_point.lucas_kanade_s87(jnp.asarray(f0), jnp.asarray(f1))

    mean_float = float(np.asarray(uf)[region].mean())
    mean_fixed = float(np.asarray(u8)[region].mean())
    np.testing.assert_allclose(mean_float, 1.1811, atol=2e-3)
    assert mean_fixed < mean_float < 2.0
    assert 0.9 < mean_fixed, mean_fixed


def test_flow_clamp():
    """Solver output saturates at +-8.0 px (flow_solver.sv:134-144)."""
    assert fixed_point.FLOW_CLAMP / (1 << fixed_point.FRAC_BITS) == 8.0


def test_identical_frames_zero_flow(natural_pair):
    f0, _ = natural_pair
    u, v = fixed_point.lucas_kanade_s87(jnp.asarray(f0), jnp.asarray(f0))
    assert np.all(np.asarray(u) == 0)
    assert np.all(np.asarray(v) == 0)


def test_s87_quantization():
    """Flow values are exact multiples of 1/128 (S8.7 LSB)."""
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    f0 = gaussian_filter(rng.uniform(0, 255, (64, 96)), 2.0).astype(np.uint8)
    f1 = np.roll(f0, 1, axis=1)
    u, v = fixed_point.lucas_kanade_s87(jnp.asarray(f0), jnp.asarray(f1))
    codes = np.asarray(u) * 128.0
    np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)


def test_box_downsample():
    f = jnp.asarray(np.arange(16, dtype=np.uint8).reshape(4, 4))
    d = np.asarray(fixed_point.box_downsample_2x(f))
    # 2x2 block [0,1,4,5] -> mean 2 (floor of 10/4)
    assert d.shape == (2, 2)
    assert d[0, 0] == 2
    assert d[1, 1] == (10 + 11 + 14 + 15) // 4
