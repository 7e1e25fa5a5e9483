"""IMU preintegration + gyro-aided pose-graph tests.

Physics checks against closed forms, segment-composition invariants, the
text IO format, and the key conventions test: gyro rotation-only edges
correcting corrupted odometry rotations on a rotating ground-truth
trajectory (pins the world->cam conjugation in vo.imu.gyro_rotation_edges).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuflow.vo import imu, se3


def _rot_angle_deg(r):
    c = np.clip((np.trace(np.asarray(r)) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(c)))


# ---------------------------------------------------------------------------
# Preintegration physics
# ---------------------------------------------------------------------------


def test_preintegrate_constant_rotation():
    """Constant body angular velocity for time T: dR == Exp(w T)."""
    w = np.array([0.3, -0.2, 0.5], np.float32)
    n, dt = 200, 0.005
    gyro = np.tile(w, (n, 1))
    accel = np.zeros((n, 3), np.float32)
    inc = imu.preintegrate(gyro, accel, dt)
    expected = se3.so3_exp(jnp.asarray(w * n * dt))
    # First-order integrator: error O(|w| dt) per step; tight at 200 Hz.
    np.testing.assert_allclose(np.asarray(inc.delta_r), np.asarray(expected),
                               atol=2e-3)
    assert abs(float(inc.dt) - n * dt) < 1e-6
    np.testing.assert_allclose(np.asarray(inc.delta_v), 0.0, atol=1e-7)


def test_preintegrate_constant_acceleration():
    """No rotation, constant specific force a: dv = a T, dp = 0.5 a T^2
    (exact for the held-sample scheme up to f32 summation)."""
    a = np.array([0.5, -1.0, 9.81], np.float32)
    n, dt = 100, 0.01
    gyro = np.zeros((n, 3), np.float32)
    accel = np.tile(a, (n, 1))
    inc = imu.preintegrate(gyro, accel, dt)
    t_total = n * dt
    np.testing.assert_allclose(np.asarray(inc.delta_v), a * t_total, rtol=1e-5)
    # Held-sample position integral: sum_k (v_k dt + 0.5 a dt^2)
    #  = 0.5 a T^2 exactly for constant a.
    np.testing.assert_allclose(
        np.asarray(inc.delta_p), 0.5 * a * t_total**2, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(inc.delta_r), np.eye(3))


def test_preintegrate_bias_correction():
    w = np.array([0.1, 0.0, 0.0], np.float32)
    gyro = np.tile(w, (50, 1))
    accel = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (50, 1))
    inc = imu.preintegrate(gyro, accel, 0.01, gyro_bias=w,
                           accel_bias=np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(inc.delta_r), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(inc.delta_v), 0.0, atol=1e-7)


def test_segments_compose_to_whole():
    """Preintegrating two adjacent segments must compose (on the
    rotation, the only graph-wired component) to the whole-interval
    increment: dR_02 == dR_01 @ dR_12."""
    rng = np.random.default_rng(8)
    n = 300
    times = np.arange(n) * 0.005
    gyro = rng.normal(scale=0.4, size=(n, 3)).astype(np.float32)
    accel = rng.normal(scale=2.0, size=(n, 3)).astype(np.float32)

    whole = imu.preintegrate_segments(
        times, gyro, accel, np.array([0.0, n * 0.005])
    )[0]
    halves = imu.preintegrate_segments(
        times, gyro, accel, np.array([0.0, 0.75, n * 0.005])
    )
    composed = np.asarray(halves[0].delta_r) @ np.asarray(halves[1].delta_r)
    np.testing.assert_allclose(
        composed, np.asarray(whole.delta_r), atol=1e-5
    )
    # Empty segment -> identity increment with the right duration.
    empty = imu.preintegrate_segments(
        times + 100.0, gyro, accel, np.array([0.0, 1.0])
    )[0]
    np.testing.assert_array_equal(np.asarray(empty.delta_r), np.eye(3))
    assert abs(float(empty.dt) - 1.0) < 1e-6


def test_segments_validation():
    t = np.array([0.0, 1.0, 0.5])
    z3 = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError):
        imu.preintegrate_segments(t, z3, z3, np.array([0.0, 1.0]))
    with pytest.raises(ValueError):
        imu.preintegrate_segments(
            np.array([0.0, 1.0, 2.0]), z3, z3, np.array([1.0, 0.0])
        )


# ---------------------------------------------------------------------------
# IO format
# ---------------------------------------------------------------------------


def test_imu_io_roundtrip(tmp_path):
    from tpuflow.io.imu import load_imu, save_imu

    rng = np.random.default_rng(2)
    n = 20
    t = np.cumsum(rng.uniform(0.004, 0.006, n))
    gyro = rng.normal(size=(n, 3)).astype(np.float32)
    accel = rng.normal(size=(n, 3)).astype(np.float32)
    path = tmp_path / "imu.txt"
    save_imu(path, t, gyro, accel, header="unit test")
    t2, g2, a2 = load_imu(path)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    np.testing.assert_allclose(g2, gyro, atol=1e-6)
    np.testing.assert_allclose(a2, accel, atol=1e-6)

    bad = tmp_path / "bad.txt"
    bad.write_text("0.0 1 2 3 4 5\n")  # 6 columns
    with pytest.raises(ValueError):
        load_imu(bad)
    bad.write_text("# only comments\n")
    with pytest.raises(ValueError):
        load_imu(bad)


# ---------------------------------------------------------------------------
# Gyro rotation edges in the pose graph
# ---------------------------------------------------------------------------


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _gt_trajectory(k=6, yaw_step_deg=6.0, dx=0.1):
    """World->cam poses: camera yawing and translating along x."""
    rs, ts = [], []
    for i in range(k):
        r_wc = _yaw(np.radians(yaw_step_deg) * i).T  # world->cam
        c = np.array([dx * i, 0.0, 0.0])
        rs.append(r_wc)
        ts.append(-(r_wc @ c))
    return np.stack(rs), np.stack(ts)


def _synth_gyro(gt_r, frame_dt=0.5, rate_hz=200.0):
    """Body-frame gyro samples reproducing the keyframe rotations:
    between keyframes, constant w = Log(R_cw_i^T R_cw_j) / dt."""
    times, gyro = [], []
    for i in range(len(gt_r) - 1):
        r_cw_i = gt_r[i].T
        r_cw_j = gt_r[i + 1].T
        drot = r_cw_i.T @ r_cw_j
        w = np.asarray(se3.so3_log(jnp.asarray(drot))) / frame_dt
        n = int(frame_dt * rate_hz)
        for s in range(n):
            times.append(i * frame_dt + s / rate_hz)
            gyro.append(w)
    times = np.asarray(times)
    gyro = np.asarray(gyro, np.float32)
    return times, gyro, np.zeros_like(gyro)


def test_gyro_edges_fix_corrupted_rotations():
    """Odometry edges with a corrupted rotation chain into a bent
    trajectory; preintegrated gyro rotation-only edges (higher weight)
    must pull the solved rotations back to ground truth — this is the
    conventions test for the world->cam conjugation."""
    from tpuflow.vo import pose_graph

    k = 6
    frame_dt = 0.5
    gt_r, gt_t = _gt_trajectory(k)
    times, gyro, accel = _synth_gyro(gt_r, frame_dt=frame_dt)

    # Odometry edges: GT relative poses, one rotation corrupted by 8 deg.
    def rel(i, j, rs, ts):
        return se3.compose(
            *se3.inverse(jnp.asarray(rs[i]), jnp.asarray(ts[i])),
            jnp.asarray(rs[j]), jnp.asarray(ts[j]),
        )

    er, et = [], []
    for i in range(k - 1):
        r, t = rel(i, i + 1, gt_r, gt_t)
        if i == 2:
            r = jnp.asarray(_yaw(np.radians(8.0))) @ r
        er.append(r)
        et.append(t)

    # Initialize poses by chaining the (corrupted) odometry.
    pr = [jnp.asarray(gt_r[0])]
    pt = [jnp.asarray(gt_t[0])]
    for i in range(k - 1):
        r, t = se3.compose(pr[-1], pt[-1], er[i], et[i])
        pr.append(r)
        pt.append(t)

    def graph():
        return pose_graph.PoseGraph(
            poses_r=jnp.stack(pr), poses_t=jnp.stack(pt),
            edge_i=jnp.arange(k - 1, dtype=jnp.int32),
            edge_j=jnp.arange(1, k, dtype=jnp.int32),
            edge_r=jnp.stack(er), edge_t=jnp.stack(et),
            edge_valid=jnp.ones(k - 1, bool),
            edge_weight=jnp.ones(k - 1, jnp.float32),
        )

    def max_rot_err_deg(g):
        return max(
            _rot_angle_deg(np.asarray(g.poses_r[i]).T @ gt_r[i])
            for i in range(k)
        )

    plain = pose_graph.solve(graph(), iterations=15)
    assert max_rot_err_deg(plain) > 5.0  # corruption survives unaided

    incs = imu.preintegrate_segments(
        times, gyro, accel, np.arange(k) * frame_dt
    )
    aided = pose_graph.solve(
        imu.gyro_rotation_edges(
            graph(), incs, [(i, i + 1) for i in range(k - 1)], weight=10.0
        ),
        iterations=15,
    )
    assert max_rot_err_deg(aided) < 1.5, max_rot_err_deg(aided)
    # Rotation-only masking: translations must not be dragged toward the
    # zero-translation measurement rows (positions stay near GT scale).
    centers = -np.einsum(
        "kij,ki->kj", np.asarray(aided.poses_r), np.asarray(aided.poses_t)
    )
    assert centers[-1, 0] > 0.3  # ~0.5 at GT; zero-drag would collapse it


def test_gyro_edges_with_extrinsic():
    """A camera-from-IMU extrinsic rotation must leave a GT-consistent
    problem at zero residual: edges measured through the extrinsic on
    GT poses produce (near-)zero rotation residuals."""
    from tpuflow.vo import pose_graph

    k = 4
    gt_r, gt_t = _gt_trajectory(k, yaw_step_deg=4.0)
    r_cam_imu = _yaw(np.radians(30.0))  # IMU mounted 30 deg off
    frame_dt = 0.5
    # IMU-frame gyro: body rotation of the IMU = conjugated camera rotation.
    times, gyro_cam, accel = _synth_gyro(gt_r, frame_dt=frame_dt)
    gyro_imu = (r_cam_imu.T @ gyro_cam.T).T.astype(np.float32)

    g = pose_graph.PoseGraph(
        poses_r=jnp.asarray(gt_r.astype(np.float32)),
        poses_t=jnp.asarray(gt_t.astype(np.float32)),
        edge_i=jnp.zeros(0, jnp.int32), edge_j=jnp.zeros(0, jnp.int32),
        edge_r=jnp.zeros((0, 3, 3)), edge_t=jnp.zeros((0, 3)),
        edge_valid=jnp.zeros(0, bool), edge_weight=jnp.zeros(0),
    )
    incs = imu.preintegrate_segments(
        times, gyro_imu, accel, np.arange(k) * frame_dt
    )
    g2 = imu.gyro_rotation_edges(
        g, incs, [(i, i + 1) for i in range(k - 1)], r_cam_imu=r_cam_imu
    )
    res = np.asarray(pose_graph.residuals(g2))
    assert np.abs(res).max() < 1e-2, np.abs(res).max()


def test_chunked_odometry_with_imu():
    """End-to-end: run_odometry_chunked accepts IMU samples and the
    solve stays consistent (the gyro agrees with the vision here, so
    the trajectory must not degrade)."""
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns
    from tpuflow.vo.pipeline import run_odometry_chunked

    base = patterns.load_base_texture(160, 120).astype(np.float32)
    n = 8
    frames = [
        nd_shift(base, (0.0, -1.2 * i), order=1, mode="nearest")
        for i in range(n)
    ]
    rate = 10.0
    frame_times = np.arange(n) / rate
    # Pure translation: zero gyro is the correct measurement.
    m = int(n * 20)
    times = np.arange(m) / (20.0 * rate)
    imu_data = (
        times,
        np.zeros((m, 3), np.float32),
        np.zeros((m, 3), np.float32),
    )
    res = run_odometry_chunked(
        frames, (150.0, 150.0, 80.0, 60.0), chunk_size=5,
        ba_iterations=6, imu=imu_data, frame_times=frame_times,
    )
    assert len(res.keyframe_indices) == n
    # Rotations must stay near identity (translation-only scene + gyro).
    for r in res.poses_r:
        assert _rot_angle_deg(r) < 3.0
    with pytest.raises(ValueError):
        run_odometry_chunked(
            frames[:6], (150.0, 150.0, 80.0, 60.0), chunk_size=5,
            ba_iterations=2, imu=imu_data,
        )


# ---------------------------------------------------------------------------
# Visual-inertial alignment (metric scale recovery)
# ---------------------------------------------------------------------------


def test_scale_gravity_alignment_recovers_truth():
    """Accelerating + yawing trajectory with exact synthetic IMU: the
    linear alignment must recover the monocular scale, the gravity
    vector, and the keyframe velocities."""
    s_true = 2.5
    g_world = np.array([0.0, 0.0, -9.81])
    amp, om, lam = 0.5, 2 * np.pi * 0.8, 0.4  # x-sinusoid + yaw rate
    vy = 0.3

    def pos(t):
        return np.array([amp * np.sin(om * t), vy * t, 0.0])

    def vel(t):
        return np.array([amp * om * np.cos(om * t), vy, 0.0])

    def acc(t):
        return np.array([-amp * om * om * np.sin(om * t), 0.0, 0.0])

    def r_wb(t):  # body->world: constant yaw rate about body y
        return _yaw(lam * t)

    k, frame_dt, rate = 8, 0.25, 1000.0
    kf_times = np.arange(k) * frame_dt

    # Exact IMU samples.
    m = int(kf_times[-1] * rate) + 1
    ts = np.arange(m) / rate
    gyro = np.tile(np.array([0.0, lam, 0.0], np.float32), (m, 1))
    accel = np.stack(
        [r_wb(t).T @ (acc(t) - g_world) for t in ts]
    ).astype(np.float32)

    # Up-to-scale VO poses (world->cam), centers divided by s_true.
    rs = np.stack([r_wb(t).T for t in kf_times])
    cs = np.stack([pos(t) / s_true for t in kf_times])
    tsv = -np.einsum("kij,kj->ki", rs, cs)

    incs = imu.preintegrate_segments(ts, gyro, accel, kf_times)
    s_hat, g_hat, v_hat, rms = imu.estimate_scale_and_gravity(rs, tsv, incs)

    assert abs(s_hat - s_true) / s_true < 0.02, s_hat
    np.testing.assert_allclose(g_hat, g_world, atol=0.15)
    for i, t in enumerate(kf_times):
        np.testing.assert_allclose(v_hat[i], vel(t), atol=0.08)
    assert rms < 0.02, rms


def test_scale_gravity_validation():
    rs = np.tile(np.eye(3), (3, 1, 1))
    ts = np.zeros((3, 3))
    with pytest.raises(ValueError):
        imu.estimate_scale_and_gravity(rs, ts, [])  # count mismatch
    inc = imu.ImuIncrement(
        delta_r=jnp.eye(3), delta_v=jnp.zeros(3), delta_p=jnp.zeros(3),
        dt=jnp.asarray(0.1),
    )
    with pytest.raises(ValueError):
        imu.estimate_scale_and_gravity(rs, ts, [inc, inc])  # K < 4


@pytest.mark.slow
def test_chunked_metric_scale_end_to_end():
    """Accelerating lateral sequence + matching synthetic IMU: the
    chunked pipeline reports a metric scale that anchors the monocular
    gauge to within ~1.5x of truth. The residual bias is VO's (LK
    underestimates subpixel motion, distorting the trajectory shape the
    alignment fits); the alignment itself recovers GT-pose problems to
    2% (test_scale_gravity_alignment_recovers_truth)."""
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns
    from tpuflow.vo.pipeline import run_odometry_chunked

    base = patterns.load_base_texture(160, 120).astype(np.float32)
    fx, depth = 150.0, 5.0
    amp, om = 0.15, 2 * np.pi * 0.3
    rate_f, n = 4.0, 16
    t_f = np.arange(n) / rate_f
    xs = amp * np.sin(om * t_f)
    frames = [
        nd_shift(base, (0.0, -fx * x / depth), order=1, mode="nearest")
        for x in xs
    ]
    rate_i = 200.0
    m = int(t_f[-1] * rate_i) + 1
    ti = np.arange(m) / rate_i
    ax = -amp * om * om * np.sin(om * ti)
    accel = np.stack(
        [ax, np.zeros(m), np.full(m, 9.81)], 1
    ).astype(np.float32)
    gyro = np.zeros((m, 3), np.float32)

    res = run_odometry_chunked(
        frames, (fx, fx, 80.0, 60.0), chunk_size=6, ba_iterations=8,
        imu=(ti, gyro, accel), frame_times=t_f,
    )
    assert res.metric_scale is not None and res.metric_scale > 0
    centers = -np.einsum("kij,ki->kj", res.poses_r, res.poses_t)
    span_vo = centers[:, 0].max() - centers[:, 0].min()
    span_gt = xs.max() - xs.min()
    ratio = res.metric_scale * span_vo / span_gt
    assert 0.4 < ratio < 1.6, (res.metric_scale, ratio)

    # Without IMU the scale stays the gauge freedom it is.
    res2 = run_odometry_chunked(
        frames[:8], (fx, fx, 80.0, 60.0), chunk_size=6, ba_iterations=4
    )
    assert res2.metric_scale is None


# ---------------------------------------------------------------------------
# Review-round regression tests (round-3 code-review findings)
# ---------------------------------------------------------------------------


def test_empty_imu_coverage_rejected_and_partial_skipped(capsys):
    """IMU samples on a different time base than the frames must error
    (identity increments would otherwise become weight-2 zero-rotation
    edges that actively bend a rotating trajectory); partial gaps skip
    only the uncovered edges, with a warning."""
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns
    from tpuflow.vo.pipeline import run_odometry_chunked

    base = patterns.load_base_texture(160, 120).astype(np.float32)
    frames = [
        nd_shift(base, (0.0, -1.2 * i), order=1, mode="nearest")
        for i in range(8)
    ]
    frame_times = np.arange(8) / 4.0  # [0, 1.75] s
    m = 100
    z = np.zeros((m, 3), np.float32)
    # Epoch-based clock: no overlap at all -> hard error.
    with pytest.raises(ValueError, match="time base"):
        run_odometry_chunked(
            frames, (150.0, 150.0, 80.0, 60.0), chunk_size=5,
            ba_iterations=2,
            imu=(1.69e9 + np.arange(m) / 50.0, z, z),
            frame_times=frame_times,
        )
    # Coverage only for the first half: runs, warns, skips the rest.
    res = run_odometry_chunked(
        frames, (150.0, 150.0, 80.0, 60.0), chunk_size=5,
        ba_iterations=4,
        imu=(np.arange(m) / 100.0, z, z),  # [0, 0.99] s only
        frame_times=frame_times,
    )
    assert len(res.keyframe_indices) == 8
    assert "no IMU samples; skipping" in capsys.readouterr().out
    assert res.metric_scale is None  # incomplete coverage: no alignment


def test_scale_gravity_alignment_with_extrinsic():
    """A camera-from-IMU extrinsic must flow into the VI alignment too
    (review finding: it was applied to gyro edges only). IMU-frame
    increments rotated by the extrinsic recover the same scale."""
    s_true = 2.5
    g_world = np.array([0.0, 0.0, -9.81])
    amp, om, vy = 0.5, 2 * np.pi * 0.8, 0.3
    r_ci = _yaw(np.radians(35.0))  # camera-from-IMU

    def pos(t):
        return np.array([amp * np.sin(om * t), vy * t, 0.0])

    def acc(t):
        return np.array([-amp * om * om * np.sin(om * t), 0.0, 0.0])

    k, frame_dt, rate = 8, 0.25, 1000.0
    kf_times = np.arange(k) * frame_dt
    m = int(kf_times[-1] * rate) + 1
    ts = np.arange(m) / rate
    gyro = np.zeros((m, 3), np.float32)
    # Camera is world-aligned (no rotation); IMU body = extrinsic-rotated
    # camera frame, so the IMU-frame specific force picks up r_ci^T.
    accel = np.stack(
        [r_ci.T @ (acc(t) - g_world) for t in ts]
    ).astype(np.float32)

    rs = np.tile(np.eye(3), (k, 1, 1))
    cs = np.stack([pos(t) / s_true for t in kf_times])
    tsv = -np.einsum("kij,kj->ki", rs, cs)
    incs = imu.preintegrate_segments(ts, gyro, accel, kf_times)
    s_hat, g_hat, _v, _rms = imu.estimate_scale_and_gravity(
        rs, tsv, incs, r_cam_imu=r_ci
    )
    assert abs(s_hat - s_true) / s_true < 0.02, s_hat
    np.testing.assert_allclose(g_hat, g_world, atol=0.15)


def test_tiled_front_end_honors_pyramid_config():
    """Review finding: the mesh-tiled front-end dropped the session's
    pyramid config. A 2-level 'shallow' tiled session must differ from
    the default tiled session (and both must run)."""
    import jax

    from tpuflow.sharding import make_flow_mesh
    from tpuflow.vo.pipeline import OdometrySession

    if len(jax.devices()) < 4:
        pytest.skip("needs the 4+ virtual-device CPU mesh")
    mesh = make_flow_mesh(batch=1, ty=2, tx=2)
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (128, 160)).astype(np.float32)
    frames = [np.roll(base, i, axis=1) for i in range(3)]

    def run(cfg_name):
        s = OdometrySession(
            (80.0, 80.0, 80.0, 64.0), grid_step=16, mesh=mesh,
            pyramid_config=cfg_name,
        )
        for f in frames:
            s.process_frame(f)
        return s.solve(ba_iterations=4)

    res_default = run("default")
    res_shallow = run("shallow")
    assert not np.array_equal(res_shallow.poses_t, res_default.poses_t)


# ---------------------------------------------------------------------------
# Tightly-coupled VI refinement (vo.vi_graph)
# ---------------------------------------------------------------------------


def _vi_problem(s_true=2.5, k=8, frame_dt=0.25, rate=1000.0, lam=0.4):
    """Yawing + accelerating trajectory with exact IMU; returns the
    up-to-scale world->cam vision poses, increments, and metric GT."""
    g_world = np.array([0.0, 0.0, -9.81])
    amp, om, vy = 0.5, 2 * np.pi * 0.8, 0.3

    def pos(t):
        return np.array([amp * np.sin(om * t), vy * t, 0.0])

    def vel(t):
        return np.array([amp * om * np.cos(om * t), vy, 0.0])

    def acc(t):
        return np.array([-amp * om * om * np.sin(om * t), 0.0, 0.0])

    def r_wb(t):
        return _yaw(lam * t)

    kf_times = np.arange(k) * frame_dt
    m = int(kf_times[-1] * rate) + 1
    ts = np.arange(m) / rate
    gyro = np.tile(np.array([0.0, lam, 0.0], np.float32), (m, 1))
    accel = np.stack(
        [r_wb(t).T @ (acc(t) - g_world) for t in ts]
    ).astype(np.float32)

    rs = np.stack([r_wb(t).T for t in kf_times])       # world->cam
    p_gt = np.stack([pos(t) for t in kf_times])
    v_gt = np.stack([vel(t) for t in kf_times])
    cs = p_gt / s_true                                  # up-to-scale VO
    tsv = -np.einsum("kij,kj->ki", rs, cs)
    incs = imu.preintegrate_segments(ts, gyro, accel, kf_times)
    return rs, tsv, incs, g_world, p_gt, v_gt, s_true


def test_vi_refinement_recovers_metric_trajectory():
    from tpuflow.vo import vi_graph

    rs, tsv, incs, g_world, p_gt, v_gt, s_true = _vi_problem()
    sol = vi_graph.solve_vi(rs, tsv, incs, g_world)
    assert abs(sol.scale - s_true) / s_true < 0.03, sol.scale
    centers = -np.einsum(
        "kij,ki->kj", sol.poses_r.astype(np.float64),
        sol.poses_t.astype(np.float64),
    )
    np.testing.assert_allclose(centers, p_gt, atol=0.02)
    np.testing.assert_allclose(sol.velocities, v_gt, atol=0.08)
    assert sol.residual_rms < 0.05


def test_vi_refinement_fixes_corrupted_vision_translation():
    """One corrupted vision position must be pulled back by the IMU
    factors: the refined trajectory is closer to metric GT than the
    (scaled) corrupted input."""
    from tpuflow.vo import vi_graph

    rs, tsv, incs, g_world, p_gt, v_gt, s_true = _vi_problem()
    centers = -np.einsum("kij,ki->kj", rs, tsv)
    centers_bad = centers.copy()
    centers_bad[4] += np.array([0.05, -0.03, 0.02])  # ~0.125 metric
    tsv_bad = -np.einsum("kij,kj->ki", rs, centers_bad)

    sol = vi_graph.solve_vi(rs, tsv_bad, incs, g_world)
    out_c = -np.einsum(
        "kij,ki->kj", sol.poses_r.astype(np.float64),
        sol.poses_t.astype(np.float64),
    )
    err_refined = np.abs(out_c[4] - p_gt[4]).max()
    err_input = np.abs(centers_bad[4] * s_true - p_gt[4]).max()
    assert err_refined < 0.4 * err_input, (err_refined, err_input)


def test_vi_refinement_validation():
    from tpuflow.vo import vi_graph

    rs, tsv, incs, g_world, *_ = _vi_problem()
    with pytest.raises(ValueError):
        vi_graph.solve_vi(rs, tsv, incs[:-1], g_world)  # count mismatch
    with pytest.raises(ValueError):
        vi_graph.solve_vi(rs[:3], tsv[:3], incs[:2], g_world)  # K < 4
    hole = list(incs)
    hole[2] = hole[2]._replace(n_samples=0)
    with pytest.raises(ValueError):
        vi_graph.solve_vi(rs, tsv, hole, g_world)  # coverage hole


@pytest.mark.slow
def test_chunked_imu_tight_recovers_metric_span():
    """imu_tight=True runs the tightly-coupled refinement: the IMU
    position factors correct the VO trajectory's shape, not just its
    scale — measured metric span ratio ~0.99 vs the loose alignment's
    ~0.69 on the same sequence."""
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns
    from tpuflow.vo.pipeline import run_odometry_chunked

    base = patterns.load_base_texture(160, 120).astype(np.float32)
    fx, depth = 150.0, 5.0
    amp, om = 0.15, 2 * np.pi * 0.3
    rate_f, n = 4.0, 16
    t_f = np.arange(n) / rate_f
    xs = amp * np.sin(om * t_f)
    frames = [
        nd_shift(base, (0.0, -fx * x / depth), order=1, mode="nearest")
        for x in xs
    ]
    rate_i = 200.0
    m = int(t_f[-1] * rate_i) + 1
    ti = np.arange(m) / rate_i
    ax = -amp * om * om * np.sin(om * ti)
    accel = np.stack(
        [ax, np.zeros(m), np.full(m, 9.81)], 1
    ).astype(np.float32)
    gyro = np.zeros((m, 3), np.float32)

    res = run_odometry_chunked(
        frames, (fx, fx, 80.0, 60.0), chunk_size=6, ba_iterations=8,
        imu=(ti, gyro, accel), frame_times=t_f, imu_tight=True,
    )
    assert res.metric_poses
    c = -np.einsum(
        "kij,ki->kj", res.poses_r.astype(np.float64),
        res.poses_t.astype(np.float64),
    )
    span = c[:, 0].max() - c[:, 0].min()
    gt_span = xs.max() - xs.min()
    assert 0.9 < span / gt_span < 1.1, span / gt_span


def test_vi_bias_jacobians_first_order():
    """First-order bias correction of zero-bias increments must match
    re-integration at the shifted bias (the Forster recursions)."""
    rng = np.random.default_rng(1)
    n, dt = 150, 0.005
    gyro = rng.normal(scale=0.5, size=(n, 3)).astype(np.float32)
    accel = rng.normal(scale=3.0, size=(n, 3)).astype(np.float32)
    base = imu.preintegrate(gyro, accel, dt, bias_jacobians=True)
    db_g = np.array([0.01, -0.02, 0.015])
    db_a = np.array([0.05, -0.08, 0.03])
    ref = imu.preintegrate(gyro, accel, dt, gyro_bias=db_g, accel_bias=db_a)
    dr_c = np.asarray(base.delta_r) @ np.asarray(
        se3.so3_exp(jnp.asarray(np.asarray(base.j_r_bg) @ db_g, jnp.float32))
    )
    dv_c = (np.asarray(base.delta_v) + np.asarray(base.j_v_bg) @ db_g
            + np.asarray(base.j_v_ba) @ db_a)
    dp_c = (np.asarray(base.delta_p) + np.asarray(base.j_p_bg) @ db_g
            + np.asarray(base.j_p_ba) @ db_a)
    # Tolerances are the second-order terms O(|db|^2) the first-order
    # correction leaves behind.
    np.testing.assert_allclose(dr_c, np.asarray(ref.delta_r), atol=5e-5)
    np.testing.assert_allclose(dv_c, np.asarray(ref.delta_v), atol=5e-4)
    np.testing.assert_allclose(dp_c, np.asarray(ref.delta_p), atol=5e-4)


def test_vi_refinement_estimates_biases():
    """Exact problem contaminated by constant gyro+accel biases: with
    estimate_bias the solver recovers the GYRO bias and keeps the
    metric trajectory accurate. The accel bias is only weakly
    observable on a short window (it trades against velocity/scale
    under slow rotation — the classic VIO result), so it is asserted
    physical, not exact; crucially the trajectory does not pay for the
    unresolved part."""
    from tpuflow.vo import vi_graph

    rs, tsv, incs, g_world, p_gt, v_gt, s_true = _vi_problem()
    b_g = np.array([0.015, -0.01, 0.02], np.float32)   # rad/s
    b_a = np.array([0.15, -0.1, 0.2], np.float32)      # m/s^2
    # Re-create the biased measurements by preintegrating samples + b.
    amp, om, vy, lam = 0.5, 2 * np.pi * 0.8, 0.3, 0.4
    k, frame_dt, rate = 8, 0.25, 1000.0
    kf_times = np.arange(k) * frame_dt
    m = int(kf_times[-1] * rate) + 1
    ts = np.arange(m) / rate

    def acc(t):
        return np.array([-amp * om * om * np.sin(om * t), 0.0, 0.0])

    gyro = np.tile(np.array([0.0, lam, 0.0], np.float32), (m, 1)) + b_g
    accel = np.stack(
        [_yaw(lam * t).T @ (acc(t) - g_world) for t in ts]
    ).astype(np.float32) + b_a
    incs_biased = imu.preintegrate_segments(
        ts, gyro, accel, kf_times, bias_jacobians=True
    )

    def max_pos_err(sol):
        c = -np.einsum(
            "kij,ki->kj", sol.poses_r.astype(np.float64),
            sol.poses_t.astype(np.float64),
        )
        return np.abs(c - p_gt).max()

    sol_no = vi_graph.solve_vi(rs, tsv, incs_biased, g_world)
    # Stronger vision-rotation weight separates the gyro bias from the
    # pose rotations (measured: at the default w_vis_rot=1 the bias is
    # half-absorbed by the trajectory).
    sol_b = vi_graph.solve_vi(
        rs, tsv, incs_biased, g_world, estimate_bias=True,
        iterations=30, w_vis_rot=5.0,
    )
    np.testing.assert_allclose(sol_b.gyro_bias, b_g, atol=5e-3)
    assert np.abs(sol_b.accel_bias).max() < 0.5  # physical magnitude
    assert max_pos_err(sol_b) < 0.06, max_pos_err(sol_b)
    assert max_pos_err(sol_b) <= max_pos_err(sol_no) + 0.01, (
        max_pos_err(sol_b), max_pos_err(sol_no)
    )
