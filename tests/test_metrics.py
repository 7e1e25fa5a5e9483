"""Metrics library tests (MAE/RMSE/EPE/AAE parity with the reference
formulae, flow_metrics.py:14-201)."""

import numpy as np

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
