"""End-to-end visual-odometry pipeline: frames -> dense flow -> feature
tracks -> keyframe observations -> bundle-adjusted trajectory.

The integration layer over the front-end (tpuflow.flow dense LK +
tpuflow.vo.tracking) and back-end (tpuflow.vo.ba). Monocular: the
trajectory is recovered up to the usual 7-DOF gauge; landmarks are
initialized by back-projecting first observations at ``init_depth`` and
camera 0 is pinned, so reported translations are in units of
``init_depth`` scale.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class OdometryResult:
    poses_r: np.ndarray      # (K, 3, 3) keyframe rotations
    poses_t: np.ndarray      # (K, 3) keyframe translations
    landmarks: np.ndarray    # (M, 3)
    keyframe_indices: list[int]
    track_count: int
    mean_reprojection_error: float


def run_odometry(
    frames: Sequence[np.ndarray],
    intrinsics: Sequence[float],
    keyframe_stride: int = 1,
    grid_step: int = 16,
    init_depth: float = 5.0,
    ba_iterations: int = 8,
    backend: str = "jnp",
) -> OdometryResult:
    """Track through ``frames`` and bundle-adjust the keyframe poses.

    frames: grayscale float32 arrays (all the same shape).
    intrinsics: (fx, fy, cx, cy).
    """
    import jax
    import jax.numpy as jnp

    from tpuflow.flow import lucas_kanade_pyramidal
    from tpuflow.vo import ba, tracking

    frames = [jnp.asarray(f, jnp.float32) for f in frames]
    intr = jnp.asarray(intrinsics, jnp.float32)
    fx, fy, cx, cy = (float(x) for x in intrinsics)

    flow_fn = jax.jit(
        lambda p, c: lucas_kanade_pyramidal(p, c, backend=backend)
    )

    tracks = tracking.seed_grid(frames[0], grid_step=grid_step)
    n_tracks = tracks.xy.shape[0]

    # Observation collection: every keyframe records the live tracks.
    keyframes = [0]
    obs_uv: list[np.ndarray] = []
    obs_cam: list[np.ndarray] = []
    obs_lm: list[np.ndarray] = []
    obs_valid: list[np.ndarray] = []

    def record(k_idx: int, trk) -> None:
        obs_uv.append(np.asarray(trk.xy))
        obs_cam.append(np.full(n_tracks, k_idx, np.int32))
        obs_lm.append(np.arange(n_tracks, dtype=np.int32))
        obs_valid.append(np.asarray(trk.alive))

    record(0, tracks)
    for i in range(1, len(frames)):
        u, v = flow_fn(frames[i - 1], frames[i])
        tracks = tracking.advance(tracks, u, v)
        if i % keyframe_stride == 0:
            keyframes.append(i)
            record(len(keyframes) - 1, tracks)

    k = len(keyframes)
    uv = np.concatenate(obs_uv)
    cam = np.concatenate(obs_cam)
    lm_idx = np.concatenate(obs_lm)
    valid = np.concatenate(obs_valid)

    # Landmarks: back-project each track's first observation at the
    # initialization depth (monocular scale convention).
    first = np.asarray(obs_uv[0])
    landmarks = np.stack(
        [
            (first[:, 0] - cx) / fx * init_depth,
            (first[:, 1] - cy) / fy * init_depth,
            np.full(n_tracks, init_depth, np.float32),
        ],
        axis=1,
    ).astype(np.float32)

    problem = ba.BAProblem(
        poses_r=jnp.tile(jnp.eye(3)[None], (k, 1, 1)),
        poses_t=jnp.zeros((k, 3)),
        landmarks=jnp.asarray(landmarks),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_cam=jnp.asarray(cam),
        obs_lm=jnp.asarray(lm_idx),
        obs_valid=jnp.asarray(valid),
        intrinsics=intr,
    )
    solved = ba.solve(problem, iterations=ba_iterations, fixed_cams=(0,))
    err = ba.reprojection_errors(solved)
    alive = np.asarray(problem.obs_valid)
    mean_err = float(np.asarray(err)[alive].mean()) if alive.any() else 0.0

    return OdometryResult(
        poses_r=np.asarray(solved.poses_r),
        poses_t=np.asarray(solved.poses_t),
        landmarks=np.asarray(solved.landmarks),
        keyframe_indices=keyframes,
        track_count=int(np.asarray(tracks.alive).sum()),
        mean_reprojection_error=mean_err,
    )
