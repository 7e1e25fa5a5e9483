"""Tightly-coupled visual-inertial trajectory refinement.

The post-hoc VI alignment (vo.imu.estimate_scale_and_gravity) fits
scale/gravity/velocities to a FROZEN visual trajectory; this module goes
one step further and re-optimizes the trajectory itself: keyframe states
(R_wb, p, v) plus one global vision scale, under

- **IMU factors** between consecutive keyframes (Forster-style
  preintegrated increments, known gravity, known/zero biases):
      r_R = Log(dR^T R_wb_i^T R_wb_j)
      r_v = R_wb_i^T (v_j - v_i - g dt) - dv
      r_p = R_wb_i^T (p_j - p_i - v_i dt - 0.5 g dt^2) - dp
- **Vision factors**: the solved monocular trajectory's consecutive
  relative poses, with the translation scaled by the unknown s
  (monocular translations are up-to-scale; rotations are not):
      r_vR = Log(dR_vis^T R_wb_i^T R_wb_j)
      r_vt = s * dt_vis - R_wb_i^T (p_j - p_i)
- a gauge prior pinning node 0's pose (gravity fixes roll/pitch
  globally; scale is observable from the accelerometer).

Full-state Gauss-Newton: residuals are one function of the stacked
tangent (K x 9 + 1 for log-scale, + 6 shared bias states with
``estimate_bias=True``), re-linearized by ``jax.jacfwd`` each
iteration — keyframe counts are small (the same dense-normal-equations
regime as vo.pose_graph). Velocity/bias states are exactly what the
rotation-only gyro edges (vo.imu.gyro_rotation_edges) cannot express;
bias updates apply through the increments' first-order bias Jacobians
(ImuIncrement.j_*), never re-integrating inside the optimizer. No
reference counterpart — the reference stops at dense flow
(SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.vo import se3
from tpuflow.vo._precision import pin_matmul_precision
from tpuflow.vo.imu import ImuIncrement


class ViSolution(NamedTuple):
    poses_r: np.ndarray   # (K, 3, 3) world->camera, METRIC translations
    poses_t: np.ndarray   # (K, 3)
    velocities: np.ndarray  # (K, 3) world-frame
    scale: float          # vision-to-metric scale factor applied
    residual_rms: float   # final weighted residual RMS
    gyro_bias: np.ndarray | None = None   # (3,) when estimate_bias
    accel_bias: np.ndarray | None = None  # (3,)


@pin_matmul_precision
def _solve_states(r_wb0, p0, v0, meas, gravity, weights, iterations,
                  estimate_bias: bool = False):
    """GN over (R_wb, p, v) x K + log-scale (+ shared biases when
    ``estimate_bias``). All jnp; K is small so dense normal equations."""
    (imu_dr, imu_dv, imu_dp, imu_dt, vis_dr, vis_dt,
     j_r_bg, j_v_bg, j_v_ba, j_p_bg, j_p_ba) = meas
    w_gyro, w_acc, w_vr, w_vt = weights
    k = r_wb0.shape[0]
    n_t = 9 * k + 1 + (6 if estimate_bias else 0)

    def residuals(tangent, r_wb, p, v, log_s, bias):
        phi = tangent[: 3 * k].reshape(k, 3)
        dp_t = tangent[3 * k : 6 * k].reshape(k, 3)
        dv_t = tangent[6 * k : 9 * k].reshape(k, 3)
        ds = tangent[9 * k]
        if estimate_bias:
            b = bias + tangent[9 * k + 1 : 9 * k + 7]
        else:
            b = jnp.zeros(6)
        b_g, b_a = b[:3], b[3:]
        r_new = jax.vmap(lambda r, f: r @ se3.so3_exp(f))(r_wb, phi)
        p_new = p + dp_t
        v_new = v + dv_t
        s = jnp.exp(log_s + ds)

        def per_edge(i):
            ri, rj = r_new[i], r_new[i + 1]
            rit = ri.T
            dt = imu_dt[i]
            # First-order bias-corrected increments (ImuIncrement
            # Jacobians; re-correcting beats re-integrating inside GN).
            dr_c = imu_dr[i] @ se3.so3_exp(j_r_bg[i] @ b_g)
            dv_c = imu_dv[i] + j_v_bg[i] @ b_g + j_v_ba[i] @ b_a
            dp_c = imu_dp[i] + j_p_bg[i] @ b_g + j_p_ba[i] @ b_a
            r_imu = se3.so3_log(dr_c.T @ (rit @ rj))
            r_vel = rit @ (v_new[i + 1] - v_new[i] - gravity * dt) - dv_c
            r_pos = (
                rit @ (p_new[i + 1] - p_new[i] - v_new[i] * dt
                       - 0.5 * gravity * dt * dt)
                - dp_c
            )
            r_vr = se3.so3_log(vis_dr[i].T @ (rit @ rj))
            r_vt = s * vis_dt[i] - rit @ (p_new[i + 1] - p_new[i])
            return jnp.concatenate([
                w_gyro * r_imu, w_acc * r_vel, w_acc * r_pos,
                w_vr * r_vr, w_vt * r_vt,
            ])

        edge_res = jax.vmap(per_edge)(jnp.arange(k - 1)).reshape(-1)
        # Gauge prior: pin node 0's pose at its initialization; soft
        # zero prior on the biases (real biases are small, and the
        # prior keeps short weakly-exciting sequences well-posed).
        prior = 10.0 * jnp.concatenate([phi[0], dp_t[0]])
        if estimate_bias:
            prior = jnp.concatenate([prior, 0.5 * b])
        return jnp.concatenate([edge_res, prior])

    def gn_step(carry, _):
        r_wb, p, v, log_s, bias = carry
        zero = jnp.zeros(n_t)
        res = residuals(zero, r_wb, p, v, log_s, bias)
        jac = jax.jacfwd(residuals)(zero, r_wb, p, v, log_s, bias)
        h = jac.T @ jac + 1e-8 * jnp.eye(n_t)
        dx = jnp.linalg.solve(h, -(jac.T @ res))
        phi = dx[: 3 * k].reshape(k, 3)
        r_wb = jax.vmap(lambda r, f: r @ se3.so3_exp(f))(r_wb, phi)
        p = p + dx[3 * k : 6 * k].reshape(k, 3)
        v = v + dx[6 * k : 9 * k].reshape(k, 3)
        log_s = log_s + dx[9 * k]
        if estimate_bias:
            bias = bias + dx[9 * k + 1 : 9 * k + 7]
        return (r_wb, p, v, log_s, bias), None

    init = (r_wb0, p0, v0, jnp.asarray(0.0), jnp.zeros(6))
    (r_wb, p, v, log_s, bias), _ = jax.lax.scan(
        gn_step, init, None, length=iterations
    )
    final = residuals(jnp.zeros(n_t), r_wb, p, v, log_s, bias)
    rms = jnp.sqrt(jnp.mean(final * final))
    return r_wb, p, v, jnp.exp(log_s), rms, bias


def solve_vi(
    poses_r: np.ndarray,
    poses_t: np.ndarray,
    increments: Sequence[ImuIncrement],
    gravity: np.ndarray,
    iterations: int = 12,
    w_gyro: float = 10.0,
    w_acc: float = 5.0,
    w_vis_rot: float = 1.0,
    w_vis_trans: float = 1.0,
    r_cam_imu: np.ndarray | None = None,
    estimate_bias: bool = False,
    init_scale: float | None = None,
    init_velocities: np.ndarray | None = None,
) -> ViSolution:
    """Refine a monocular trajectory into a metric one with IMU factors.

    ``poses_r/poses_t``: world->camera keyframe poses from the visual
    solve (up-to-scale). ``increments``: K-1 preintegrated IMU
    increments between consecutive keyframes, all with real sample
    coverage. ``gravity``: world-frame gravity vector (e.g. from
    vo.imu.estimate_scale_and_gravity, or known (0, 0, -9.81) when the
    VO world frame is gravity-aligned). Initialization: poses from
    vision (positions pre-scaled by the linear alignment's estimate),
    velocities from the same alignment.

    ``estimate_bias=True`` adds shared gyro/accel bias states, applied
    to the increments through their first-order bias Jacobians
    (ImuIncrement.j_*; no re-integration inside the optimizer) with a
    soft zero prior. Needs acceleration/rotation excitation to separate
    biases from gravity/velocity — check the returned biases are
    physical (real MEMS biases are < ~0.05 rad/s / ~0.5 m/s^2).
    """
    k = len(poses_r)
    if len(increments) != k - 1:
        raise ValueError(
            f"need K-1={k - 1} increments for K={k} poses, got {len(increments)}"
        )
    if k < 4:
        raise ValueError("VI refinement needs >= 4 keyframes")
    if any(int(inc.n_samples) == 0 for inc in increments):
        raise ValueError(
            "every keyframe interval needs IMU coverage for tight "
            "coupling (an increment has n_samples == 0)"
        )
    if estimate_bias and any(inc.j_r_bg is None for inc in increments):
        raise ValueError(
            "estimate_bias needs increments preintegrated with "
            "bias_jacobians=True (zero Jacobians would silently pin the "
            "biases instead of estimating them)"
        )
    poses_r = np.asarray(poses_r, np.float64)
    poses_t = np.asarray(poses_t, np.float64)
    r_ci = np.eye(3) if r_cam_imu is None else np.asarray(r_cam_imu, np.float64)

    # Initialize from the linear alignment (scale + velocities) — or
    # from the caller's precomputed alignment (run_odometry_chunked
    # already ran it for the gravity gate; no need to solve twice).
    if init_scale is not None and init_velocities is not None:
        s0, v0 = float(init_scale), np.asarray(init_velocities, np.float64)
    else:
        from tpuflow.vo.imu import estimate_scale_and_gravity

        s0, _g, v0, _rms = estimate_scale_and_gravity(
            poses_r, poses_t, list(increments), r_cam_imu=r_cam_imu
        )
    s0 = max(float(s0), 1e-3)
    r_wb0 = np.transpose(poses_r, (0, 2, 1)) @ r_ci   # IMU-body -> world
    centers = -np.einsum("kij,ki->kj", poses_r, poses_t)
    p0 = centers * s0

    # Vision measurements: consecutive relative body poses of the input
    # (rotation exact; translation up-to-scale, in the body-i frame).
    # Translations are taken from the s0-PRE-SCALED positions so the
    # solver's scale unknown is a correction near 1 (well-conditioned
    # log-scale steps); total vision-to-metric scale = s0 * correction.
    vis_dr = np.stack(
        [r_wb0[i].T @ r_wb0[i + 1] for i in range(k - 1)]
    )
    vis_dt = np.stack(
        [r_wb0[i].T @ (p0[i + 1] - p0[i]) for i in range(k - 1)]
    )

    z33 = jnp.zeros((3, 3), jnp.float32)

    def jstack(field):
        return jnp.stack([
            z33 if getattr(inc, field) is None
            else jnp.asarray(getattr(inc, field), jnp.float32)
            for inc in increments
        ])

    meas = (
        jnp.stack([jnp.asarray(inc.delta_r, jnp.float32) for inc in increments]),
        jnp.stack([jnp.asarray(inc.delta_v, jnp.float32) for inc in increments]),
        jnp.stack([jnp.asarray(inc.delta_p, jnp.float32) for inc in increments]),
        jnp.asarray([float(inc.dt) for inc in increments], jnp.float32),
        jnp.asarray(vis_dr),
        jnp.asarray(vis_dt),
        jstack("j_r_bg"), jstack("j_v_bg"), jstack("j_v_ba"),
        jstack("j_p_bg"), jstack("j_p_ba"),
    )
    # The solver's scale multiplies vis_dt, whose input positions are
    # already s0-scaled — so the solved s is a CORRECTION near 1, and
    # the total vision-to-metric scale is s0 * s.
    r_wb, p, v, s_corr, rms, bias = _solve_states(
        jnp.asarray(r_wb0), jnp.asarray(p0),
        jnp.asarray(v0, jnp.float32),
        meas, jnp.asarray(gravity, jnp.float32),
        (float(w_gyro), float(w_acc), float(w_vis_rot), float(w_vis_trans)),
        int(iterations), estimate_bias=estimate_bias,
    )
    r_wb = np.asarray(r_wb)
    p = np.asarray(p)
    out_r = np.transpose(r_wb @ r_ci.T, (0, 2, 1))     # back to world->cam
    out_t = -np.einsum("kij,kj->ki", out_r, p)
    bias_np = np.asarray(bias, np.float32)
    return ViSolution(
        poses_r=out_r.astype(np.float32),
        poses_t=out_t.astype(np.float32),
        velocities=np.asarray(v, np.float64).astype(np.float32),
        scale=float(s0) * float(s_corr),
        residual_rms=float(rms),
        gyro_bias=bias_np[:3] if estimate_bias else None,
        accel_bias=bias_np[3:] if estimate_bias else None,
    )
