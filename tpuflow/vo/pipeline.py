"""End-to-end visual-odometry pipeline: frames -> dense flow -> feature
tracks -> keyframe observations -> bundle-adjusted trajectory.

The integration layer over the front-end (tpuflow.flow dense LK +
tpuflow.vo.tracking) and back-end (tpuflow.vo.ba). Monocular: the
trajectory is recovered up to the usual 7-DOF gauge; landmarks are
initialized by back-projecting first observations at ``init_depth`` and
camera 0 is pinned, so reported translations are in units of
``init_depth`` scale.

Long sequences run through :class:`OdometrySession`, which processes
frames incrementally and can be checkpointed/resumed at any frame
boundary (tpuflow.vo.checkpoint) — the back-end state persistence the
reference has no counterpart for (SURVEY.md §5 "Checkpoint / resume").
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


class OdometrySession:
    """Incremental VO: feed frames one at a time, solve/checkpoint anytime.

    State = tracker table + per-keyframe observation records + the last
    frame (needed to compute flow to the next one). Everything is held
    as NumPy so a session round-trips exactly through
    ``state_dict``/``from_state``.
    """

    def __init__(
        self,
        intrinsics: Sequence[float],
        keyframe_stride: int = 1,
        grid_step: int = 16,
        init_depth: float = 5.0,
        backend: str = "jnp",
        fb_check_threshold: float | None = None,
    ) -> None:
        import jax

        from tpuflow.flow import lucas_kanade_pyramidal

        self.intrinsics = tuple(float(x) for x in intrinsics)
        self.keyframe_stride = int(keyframe_stride)
        self.grid_step = int(grid_step)
        self.init_depth = float(init_depth)
        self.backend = backend
        # Optional forward-backward flow consistency culling (px).
        self.fb_check_threshold = (
            None if fb_check_threshold is None else float(fb_check_threshold)
        )

        self._flow_fn = jax.jit(
            lambda p, c: lucas_kanade_pyramidal(p, c, backend=backend)
        )

        # Mutable state (set by start / from_state).
        self.frame_index = -1
        self.keyframes: list[int] = []
        self.obs_uv: list[np.ndarray] = []      # per keyframe: (N, 2)
        self.obs_lm: list[np.ndarray] = []      # per keyframe: (N,) int32
        self.obs_valid: list[np.ndarray] = []   # per keyframe: (N,) bool
        self._tracks = None                     # tracking.Tracks
        self._prev_frame: np.ndarray | None = None
        # Track lifecycle: each slot carries a landmark id; dead slots
        # are reseeded at keyframes with NEW landmark ids, so long
        # sequences keep a live observation stream instead of bleeding
        # out the initial seeding.
        self.track_lm: np.ndarray | None = None  # (N,) int32
        self.lm_first_uv: np.ndarray | None = None  # (n_landmarks, 2)
        self.n_landmarks = 0

    # -- lifecycle ---------------------------------------------------------

    def start(self, first_frame: np.ndarray) -> None:
        """Seed features on the first frame and record keyframe 0."""
        import jax.numpy as jnp

        from tpuflow.vo import tracking

        frame = jnp.asarray(first_frame, jnp.float32)
        self._tracks = tracking.seed_grid(frame, grid_step=self.grid_step)
        self._prev_frame = np.asarray(frame)
        self.frame_index = 0
        self.keyframes = [0]
        n = int(self._tracks.xy.shape[0])
        self.track_lm = np.arange(n, dtype=np.int32)
        self.lm_first_uv = np.asarray(self._tracks.xy, np.float32).copy()
        self.n_landmarks = n
        self._record()

    def process_frame(self, frame: np.ndarray) -> None:
        """Advance tracks by dense flow prev->frame; record on keyframes."""
        import jax.numpy as jnp

        from tpuflow.vo import tracking

        if self.frame_index < 0:
            self.start(frame)
            return
        cur = jnp.asarray(frame, jnp.float32)
        prv = jnp.asarray(self._prev_frame)
        prev_xy = self._tracks.xy
        u, v = self._flow_fn(prv, cur)
        self._tracks = tracking.advance(self._tracks, u, v)
        if self.fb_check_threshold is not None:
            ub, vb = self._flow_fn(cur, prv)
            self._tracks = tracking.forward_backward_check(
                self._tracks, prev_xy, ub, vb,
                threshold=self.fb_check_threshold,
            )
        self._prev_frame = np.asarray(cur)
        self.frame_index += 1
        if self.frame_index % self.keyframe_stride == 0:
            self.keyframes.append(self.frame_index)
            self._reseed(cur)
            self._record()

    def _record(self) -> None:
        self.obs_uv.append(np.asarray(self._tracks.xy, np.float32))
        self.obs_lm.append(self.track_lm.copy())
        self.obs_valid.append(np.asarray(self._tracks.alive))

    def _reseed(self, frame) -> None:
        """Refill dead track slots with fresh corners and new landmark
        ids (their first observation is the current keyframe, so the
        landmark back-projects from it at ``init_depth`` like every
        other landmark)."""
        from tpuflow.vo import tracking

        alive = np.asarray(self._tracks.alive)
        dead = ~alive
        if not dead.any():
            return
        fresh = tracking.seed_grid(frame, grid_step=self.grid_step)
        good = np.asarray(fresh.alive) & dead
        n_new = int(good.sum())
        if n_new == 0:
            return
        import jax.numpy as jnp

        ids = self.track_lm.copy()
        ids[good] = np.arange(
            self.n_landmarks, self.n_landmarks + n_new, dtype=np.int32
        )
        self.track_lm = ids
        self.n_landmarks += n_new

        fresh_xy = np.asarray(fresh.xy, np.float32)
        xy = np.asarray(self._tracks.xy, np.float32).copy()
        start = np.asarray(self._tracks.start_xy, np.float32).copy()
        age = np.asarray(self._tracks.age, np.int32).copy()
        xy[good] = fresh_xy[good]
        start[good] = fresh_xy[good]
        age[good] = 0
        self._tracks = tracking.Tracks(
            xy=jnp.asarray(xy),
            start_xy=jnp.asarray(start),
            age=jnp.asarray(age),
            alive=jnp.asarray(alive | good),
        )
        self.lm_first_uv = np.concatenate(
            [self.lm_first_uv, fresh_xy[good]], axis=0
        )

    # -- solve -------------------------------------------------------------

    def _essential_initial_poses(self) -> tuple[np.ndarray, np.ndarray]:
        """Closed-form pose chain from per-edge essential matrices.

        For each consecutive keyframe pair: match observation slots that
        kept the same landmark id, run the jitted 8-point + cheirality
        pipeline (tpuflow.vo.epipolar.two_view_init), and chain the
        relative poses. Monocular per-edge scale is propagated by the
        depth ratio of landmarks shared with the previous edge; the
        first edge is scaled so the median triangulated depth equals
        ``init_depth`` (the session's monocular gauge convention).
        Degenerate edges (too few matches, ~zero pixel motion, or a
        losing cheirality vote) fall back to an identity relative pose.
        """
        import jax.numpy as jnp

        from tpuflow.vo import epipolar, se3

        k = len(self.keyframes)
        intr = jnp.asarray(self.intrinsics, jnp.float32)
        pr = np.tile(np.eye(3, dtype=np.float32)[None], (k, 1, 1))
        pt = np.zeros((k, 3), np.float32)
        prev_edge = None  # (lm_ids, points_unit (N,3), rel_r, rel_t, scale)
        scale = 1.0
        for e in range(k - 1):
            valid = (
                self.obs_valid[e]
                & self.obs_valid[e + 1]
                & (self.obs_lm[e] == self.obs_lm[e + 1])
            )
            uv1 = self.obs_uv[e]
            uv2 = self.obs_uv[e + 1]
            disp = np.linalg.norm(uv2 - uv1, axis=1)
            moved = float(np.median(disp[valid])) if valid.any() else 0.0
            if int(valid.sum()) < 8 or moved < 0.5:
                # Near-degenerate: keep the previous pose (identity edge).
                pr[e + 1] = pr[e]
                pt[e + 1] = pt[e]
                prev_edge = None
                continue
            init = epipolar.two_view_init(
                jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), intr
            )
            n_good = int(init.n_good)
            if n_good < max(8, 0.5 * int(valid.sum())):
                pr[e + 1] = pr[e]
                pt[e + 1] = pt[e]
                prev_edge = None
                continue
            rel_r = np.asarray(init.r)
            rel_t = np.asarray(init.t)
            depths = np.asarray(init.depths1)
            good = np.asarray(init.good)
            x1 = np.asarray(
                epipolar.normalize_pixels(jnp.asarray(uv1), intr)
            )
            pts_unit = (
                np.concatenate([x1, np.ones((x1.shape[0], 1))], axis=1)
                * depths[:, None]
            ).astype(np.float32)

            if prev_edge is None:
                scale = self.init_depth / max(
                    float(np.median(depths[good])), 1e-6
                )
            else:
                p_ids, p_pts, p_r, p_t, p_scale = prev_edge
                common = (
                    good
                    & p_ids[1]
                    & (self.obs_lm[e] == p_ids[0])
                )
                if int(common.sum()) >= 4:
                    # Previous edge's points, moved into this frame and
                    # scaled: depth each shared landmark *should* have.
                    z_prev = p_scale * (p_pts[common] @ p_r.T + p_t)[:, 2]
                    z_cur = depths[common]
                    ratio = z_prev / np.maximum(z_cur, 1e-6)
                    ratio = ratio[(z_prev > 1e-6) & (z_cur > 1e-6)]
                    if ratio.size >= 4:
                        scale = float(np.median(ratio))
            rj, tj = se3.compose(
                jnp.asarray(rel_r), jnp.asarray(rel_t * scale),
                jnp.asarray(pr[e]), jnp.asarray(pt[e]),
            )
            pr[e + 1] = np.asarray(rj)
            pt[e + 1] = np.asarray(tj)
            prev_edge = (
                (self.obs_lm[e].copy(), good), pts_unit, rel_r, rel_t, scale
            )
        return pr, pt

    def solve(
        self,
        ba_iterations: int = 8,
        window: int | None = None,
        essential_init: bool = False,
    ) -> OdometryResult:
        """Bundle-adjust the keyframe poses recorded so far.

        ``window``: if set, only the most recent ``window`` keyframes are
        free — older poses are held fixed (sliding-window BA for long
        sequences; landmarks stay free so re-observed old landmarks keep
        constraining the window). Camera 0 is always pinned (gauge).

        ``essential_init``: bootstrap poses from per-edge essential-
        matrix decompositions and landmarks from multi-view linear
        triangulation instead of identity/flat-depth — the large-
        baseline initialization (tpuflow.vo.epipolar).
        """
        import jax.numpy as jnp

        from tpuflow.vo import ba

        fx, fy, cx, cy = self.intrinsics
        k = len(self.keyframes)
        n_tracks = self.obs_uv[0].shape[0]
        uv = np.concatenate(self.obs_uv)
        cam = np.concatenate(
            [np.full(n_tracks, i, np.int32) for i in range(k)]
        )
        lm_idx = np.concatenate(self.obs_lm)
        valid = np.concatenate(self.obs_valid)

        # Landmarks: back-project each landmark's first observation at
        # the initialization depth (monocular scale convention; all
        # keyframe poses initialize at identity, so the convention is
        # consistent for landmarks spawned at later keyframes too).
        first = self.lm_first_uv
        n_lm = self.n_landmarks
        landmarks = np.stack(
            [
                (first[:, 0] - cx) / fx * self.init_depth,
                (first[:, 1] - cy) / fy * self.init_depth,
                np.full(n_lm, self.init_depth, np.float32),
            ],
            axis=1,
        ).astype(np.float32)

        if essential_init and k >= 2:
            from tpuflow.vo import epipolar

            pr0, pt0 = self._essential_initial_poses()
            init_r = jnp.asarray(pr0)
            init_t = jnp.asarray(pt0)
            lm0 = epipolar.triangulate_landmarks(
                init_r, init_t,
                jnp.asarray(uv, jnp.float32), jnp.asarray(cam),
                jnp.asarray(lm_idx), jnp.asarray(valid),
                jnp.asarray(self.intrinsics, jnp.float32),
                n_landmarks=n_lm,
                fallback=jnp.asarray(landmarks),
            )
        else:
            init_r = jnp.tile(jnp.eye(3)[None], (k, 1, 1))
            init_t = jnp.zeros((k, 3))
            lm0 = jnp.asarray(landmarks)

        problem = ba.BAProblem(
            poses_r=init_r,
            poses_t=init_t,
            landmarks=lm0,
            obs_uv=jnp.asarray(uv, jnp.float32),
            obs_cam=jnp.asarray(cam),
            obs_lm=jnp.asarray(lm_idx),
            obs_valid=jnp.asarray(valid),
            intrinsics=jnp.asarray(self.intrinsics, jnp.float32),
        )
        if window is not None and k > window:
            fixed = tuple(range(k - window))  # includes camera 0
        else:
            fixed = (0,)
        solved = ba.solve(
            problem, iterations=ba_iterations, fixed_cams=fixed
        )
        err = ba.reprojection_errors(solved)
        alive = np.asarray(problem.obs_valid)
        mean_err = float(np.asarray(err)[alive].mean()) if alive.any() else 0.0

        return OdometryResult(
            poses_r=np.asarray(solved.poses_r),
            poses_t=np.asarray(solved.poses_t),
            landmarks=np.asarray(solved.landmarks),
            keyframe_indices=list(self.keyframes),
            track_count=int(np.asarray(self._tracks.alive).sum()),
            mean_reprojection_error=mean_err,
        )

    # -- checkpointable state ---------------------------------------------

    def state_dict(self) -> dict:
        """Array-only pytree capturing the full resumable state."""
        from tpuflow.vo import tracking  # noqa: F401  (Tracks fields below)

        t = self._tracks
        return {
            "frame_index": np.int64(self.frame_index),
            "keyframes": np.asarray(self.keyframes, np.int64),
            "obs_uv": np.stack(self.obs_uv),          # (K, N, 2)
            "obs_lm": np.stack(self.obs_lm),          # (K, N)
            "obs_valid": np.stack(self.obs_valid),    # (K, N)
            "prev_frame": np.asarray(self._prev_frame, np.float32),
            "tracks_xy": np.asarray(t.xy, np.float32),
            "tracks_start_xy": np.asarray(t.start_xy, np.float32),
            "tracks_age": np.asarray(t.age, np.int32),
            "tracks_alive": np.asarray(t.alive, bool),
            "track_lm": np.asarray(self.track_lm, np.int32),
            "lm_first_uv": np.asarray(self.lm_first_uv, np.float32),
            "n_landmarks": np.int64(self.n_landmarks),
        }

    def meta_dict(self) -> dict:
        """JSON-able static configuration."""
        return {
            "intrinsics": list(self.intrinsics),
            "keyframe_stride": self.keyframe_stride,
            "grid_step": self.grid_step,
            "init_depth": self.init_depth,
            "backend": self.backend,
            "fb_check_threshold": self.fb_check_threshold,
        }

    @classmethod
    def from_state(cls, meta: dict, state: dict) -> "OdometrySession":
        import jax.numpy as jnp

        from tpuflow.vo import tracking

        sess = cls(
            intrinsics=meta["intrinsics"],
            keyframe_stride=meta["keyframe_stride"],
            grid_step=meta["grid_step"],
            init_depth=meta["init_depth"],
            backend=meta["backend"],
            fb_check_threshold=meta.get("fb_check_threshold"),
        )
        sess.frame_index = int(state["frame_index"])
        sess.keyframes = [int(x) for x in np.asarray(state["keyframes"])]
        sess.obs_uv = [
            np.asarray(x, np.float32) for x in np.asarray(state["obs_uv"])
        ]
        sess.obs_lm = [
            np.asarray(x, np.int32) for x in np.asarray(state["obs_lm"])
        ]
        sess.obs_valid = [
            np.asarray(x, bool) for x in np.asarray(state["obs_valid"])
        ]
        sess.track_lm = np.asarray(state["track_lm"], np.int32)
        sess.lm_first_uv = np.asarray(state["lm_first_uv"], np.float32)
        sess.n_landmarks = int(state["n_landmarks"])
        sess._prev_frame = np.asarray(state["prev_frame"], np.float32)
        sess._tracks = tracking.Tracks(
            xy=jnp.asarray(state["tracks_xy"], jnp.float32),
            start_xy=jnp.asarray(state["tracks_start_xy"], jnp.float32),
            age=jnp.asarray(state["tracks_age"], jnp.int32),
            alive=jnp.asarray(np.asarray(state["tracks_alive"], bool)),
        )
        return sess


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
    session = OdometrySession(
        intrinsics,
        keyframe_stride=keyframe_stride,
        grid_step=grid_step,
        init_depth=init_depth,
        backend=backend,
    )
    for frame in frames:
        session.process_frame(frame)
    return session.solve(ba_iterations=ba_iterations)


def run_odometry_chunked(
    frames: Sequence[np.ndarray],
    intrinsics: Sequence[float],
    chunk_size: int = 6,
    overlap: int = 2,
    grid_step: int = 16,
    init_depth: float = 5.0,
    ba_iterations: int = 8,
    pg_iterations: int = 15,
    backend: str = "jnp",
) -> "OdometryResult":
    """Local-BA + global pose-graph odometry (the classic SLAM split).

    Frames are processed in overlapping chunks: each chunk runs dense
    flow -> tracks -> bundle adjustment independently (bounded problem
    size, chunks could run in parallel), producing relative poses
    between its consecutive keyframes. Chunk scales (the monocular gauge
    freedom of each local solve) are chained through the shared overlap
    edge, then all relative-pose constraints are fused by global
    pose-graph Gauss-Newton (tpuflow.vo.pose_graph) — the "keyframe
    pose-graph optimization" stage of the BASELINE north star, fed by
    the BA front-end rather than replacing it.

    ``overlap`` must be >= 2 so consecutive chunks share one relative
    pose for scale chaining.
    """
    import jax.numpy as jnp

    from tpuflow.vo import pose_graph, se3

    if overlap < 2:
        raise ValueError("overlap must be >= 2 for scale chaining")
    n = len(frames)
    step = chunk_size - overlap + 1
    starts = list(range(0, max(n - chunk_size, 0) + 1, step - 1 if step > 1 else 1))
    if starts[-1] + chunk_size < n:
        starts.append(n - chunk_size)

    def rel(pr, pt, i, j):
        """T_i^-1 o T_j (the pose-graph edge measurement convention)."""
        ri, ti = se3.inverse(jnp.asarray(pr[i]), jnp.asarray(pt[i]))
        return se3.compose(ri, ti, jnp.asarray(pr[j]), jnp.asarray(pt[j]))

    edges = {}  # (gi, gj) -> (R, t)
    scale = 1.0
    prev_shared = None  # ((gi, gj), |t| in previous chunk's scale)
    last_result = None
    for s in starts:
        res = run_odometry(
            frames[s : s + chunk_size], intrinsics,
            grid_step=grid_step, init_depth=init_depth,
            ba_iterations=ba_iterations, backend=backend,
        )
        last_result = res
        kf = [s + i for i in res.keyframe_indices]
        rels = [
            (kf[i], kf[i + 1], rel(res.poses_r, res.poses_t, i, i + 1))
            for i in range(len(kf) - 1)
        ]
        if prev_shared is not None:
            (gi, gj), prev_norm = prev_shared
            match = [r for r in rels if (r[0], r[1]) == (gi, gj)]
            if match:
                tn = float(np.linalg.norm(np.asarray(match[0][2][1])))
                if tn > 1e-9:
                    scale *= prev_norm / tn
        for gi, gj, (rr, tt) in rels:
            if (gi, gj) not in edges:
                edges[(gi, gj)] = (np.asarray(rr), np.asarray(tt) * scale)
        last_gi, last_gj, (rr, tt) = rels[-1]
        prev_shared = (
            (last_gi, last_gj),
            float(np.linalg.norm(np.asarray(tt))) * scale,
        )

    # Global keyframe set + sequential initialization by chaining edges.
    nodes = sorted({i for ij in edges for i in ij})
    idx = {g: k for k, g in enumerate(nodes)}
    k = len(nodes)
    pr = np.tile(np.eye(3, dtype=np.float32)[None], (k, 1, 1))
    pt = np.zeros((k, 3), np.float32)
    for (gi, gj), (rr, tt) in sorted(edges.items()):
        i, j = idx[gi], idx[gj]
        rj, tj = se3.compose(
            jnp.asarray(pr[i]), jnp.asarray(pt[i]),
            jnp.asarray(rr), jnp.asarray(tt),
        )
        pr[j] = np.asarray(rj)
        pt[j] = np.asarray(tj)

    ei = np.asarray([idx[a] for (a, _b) in edges], np.int32)
    ej = np.asarray([idx[b] for (_a, b) in edges], np.int32)
    er = np.stack([e[0] for e in edges.values()])
    et = np.stack([e[1] for e in edges.values()])
    g = pose_graph.PoseGraph(
        poses_r=jnp.asarray(pr),
        poses_t=jnp.asarray(pt),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_r=jnp.asarray(er),
        edge_t=jnp.asarray(et),
        edge_valid=jnp.ones(len(edges), bool),
        edge_weight=jnp.ones(len(edges), jnp.float32),
    )
    solved = pose_graph.solve(g, iterations=pg_iterations)
    resid = float(
        jnp.abs(pose_graph.residuals(solved)).max()
    )
    return OdometryResult(
        poses_r=np.asarray(solved.poses_r),
        poses_t=np.asarray(solved.poses_t),
        landmarks=last_result.landmarks,
        keyframe_indices=nodes,
        track_count=last_result.track_count,
        mean_reprojection_error=resid,
    )
