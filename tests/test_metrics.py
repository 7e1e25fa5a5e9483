"""Metrics library tests (MAE/RMSE/EPE/AAE parity with the reference
formulae, flow_metrics.py:14-201)."""

import numpy as np
import pytest

from tpuflow.eval import metrics


def test_mae_constant_field():
    u = np.full((10, 10), 2.0, np.float32)
    v = np.full((10, 10), -1.0, np.float32)
    mae_u, mae_v = metrics.mean_absolute_error(u, v, 2.0, 0.0)
    assert mae_u == 0.0
    assert mae_v == 1.0


def test_epe_pythagorean():
    u = np.full((4, 4), 3.0, np.float32)
    v = np.full((4, 4), 4.0, np.float32)
    assert abs(metrics.endpoint_error(u, v, 0.0, 0.0) - 5.0) < 1e-6


def test_rmse_equals_epe_for_constant_error():
    u = np.full((4, 4), 1.0, np.float32)
    v = np.zeros((4, 4), np.float32)
    assert abs(metrics.root_mean_square_error(u, v, 0.0, 0.0) - 1.0) < 1e-6


def test_aae_zero_when_both_zero():
    z = np.zeros((5, 5), np.float32)
    assert metrics.angular_error(z, z, 0.0, 0.0) == 0.0


def test_aae_aligned_vectors():
    u = np.full((5, 5), 2.0, np.float32)
    v = np.full((5, 5), 1.0, np.float32)
    # f32 arccos near dot=1 is noisy; 0.1 deg is ample for alignment.
    assert metrics.angular_error(u, v, 2.0, 1.0) < 0.1


def test_aae_known_angle():
    # pred (1,0,1) vs true (0,0,1): angle = 45 degrees.
    u = np.ones((3, 3), np.float32)
    v = np.zeros((3, 3), np.float32)
    assert abs(metrics.angular_error(u, v, 0.0, 0.0) - 45.0) < 1e-3


def test_mask_selects_pixels():
    u = np.zeros((4, 4), np.float32)
    u[0, 0] = 100.0
    v = np.zeros((4, 4), np.float32)
    mask = np.ones((4, 4), bool)
    mask[0, 0] = False
    mae_u, _ = metrics.mean_absolute_error(u, v, 0.0, 0.0, mask)
    assert mae_u == 0.0


def test_compute_all_metrics_keys():
    u = np.zeros((4, 4), np.float32)
    out = metrics.compute_all_metrics(u, u, 0.0, 0.0)
    assert set(out) == {"mae_u", "mae_v", "rmse", "epe", "aae"}


def test_parity_with_reference_formulas(rng):
    """Cross-check against scipy-free formulas on random fields."""
    u = rng.normal(1.0, 2.0, (20, 30)).astype(np.float32)
    v = rng.normal(-0.5, 1.0, (20, 30)).astype(np.float32)
    mask = rng.uniform(size=(20, 30)) > 0.3
    m = metrics.compute_all_metrics(u, v, 1.5, 0.5, mask)
    eu = u[mask] - 1.5
    ev = v[mask] - 0.5
    assert abs(m["mae_u"] - np.abs(eu).mean()) < 1e-5
    assert abs(m["epe"] - np.sqrt(eu**2 + ev**2).mean()) < 1e-5
    assert abs(m["rmse"] - np.sqrt((eu**2 + ev**2).mean())) < 1e-5


# ---------------------------------------------------------------------------
# Dense analytic ground truth (patterns.dense_ground_truth + dense metrics)
# ---------------------------------------------------------------------------


def test_dense_gt_translation_is_constant():
    from tpuflow.eval import patterns

    p = patterns.TEST_PATTERNS["translate_medium"]
    u, v, vis = patterns.dense_ground_truth(p, 320, 240)
    np.testing.assert_allclose(u, 2.0, atol=1e-6)
    np.testing.assert_allclose(v, 0.0, atol=1e-6)
    # Rightmost 2 columns leave the frame.
    assert vis[:, :317].all() and not vis[:, 319].any()


def test_dense_gt_matches_cv2_matrix():
    """The NumPy matrix construction must equal cv2.getRotationMatrix2D
    + the dx/dy shift used by apply_motion (same forward mapping)."""
    cv2 = pytest.importorskip("cv2")
    from tpuflow.eval import patterns

    p = patterns.MotionParameters("x", dx=5.0, dy=-3.0, rotation=7.0, scale=1.08)
    w, h = 64, 48
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), p.rotation, p.scale)
    m[0, 2] += p.dx
    m[1, 2] += p.dy
    u, v, _ = patterns.dense_ground_truth(p, w, h)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    xd = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    yd = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    np.testing.assert_allclose(u, (xd - xs).astype(np.float32), atol=1e-4)
    np.testing.assert_allclose(v, (yd - ys).astype(np.float32), atol=1e-4)


def test_dense_gt_warps_frames_onto_each_other():
    """Backward-warping frame 1 by the dense GT field reproduces frame 0
    on the visible region (the flow-convention ground truth)."""
    import jax.numpy as jnp

    from tpuflow.eval import patterns
    from tpuflow.kernels import jnp_ref

    p = patterns.TEST_PATTERNS["rotate_medium"]
    base = patterns.load_base_texture(320, 240).astype(np.float32)
    moved = patterns.apply_motion(base.astype(np.uint8), p).astype(np.float32)
    u, v, vis = patterns.dense_ground_truth(p, 320, 240)
    back = np.asarray(
        jnp_ref.warp_image(jnp.asarray(moved), jnp.asarray(u), jnp.asarray(v))
    )
    # Interior visible region. Double bilinear resampling (cv2 warp
    # forward + our backward warp) on the high-frequency texture leaves
    # a few gray levels of interpolation noise; a wrong field would be
    # off by the raw frame difference instead.
    inner = np.zeros_like(vis)
    inner[20:-20, 20:-20] = True
    sel = vis & inner
    err = float(np.mean(np.abs(back - base)[sel]))
    raw = float(np.mean(np.abs(moved - base)[sel]))
    assert err < 4.0, err
    assert err < 0.25 * raw, (err, raw)


def test_dense_metrics_equal_scalar_for_translation():
    from tpuflow.eval.metrics import compute_all_metrics, compute_all_metrics_dense

    rng = np.random.default_rng(0)
    u = rng.normal(2.0, 0.3, (40, 50)).astype(np.float32)
    v = rng.normal(0.0, 0.3, (40, 50)).astype(np.float32)
    gt_u = np.full((40, 50), 2.0, np.float32)
    gt_v = np.zeros((40, 50), np.float32)
    mask = np.zeros((40, 50), bool)
    mask[5:-5, 5:-5] = True
    a = compute_all_metrics(u, v, 2.0, 0.0, mask)
    b = compute_all_metrics_dense(u, v, gt_u, gt_v, mask)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-5, (k, a[k], b[k])
