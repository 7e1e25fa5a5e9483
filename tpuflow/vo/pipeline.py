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
    # Frame indices where tracking was lost (alive fraction fell below
    # the session's loss threshold). Monocular trajectory segments
    # separated by a loss event are NOT metrically connected — after a
    # total occlusion the new segment re-anchors near the last pose
    # with fresh (unobservable) scale. Empty = continuous tracking.
    track_loss_frames: list[int] = dataclasses.field(default_factory=list)


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
        mesh=None,
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
        # Optional ("batch", "ty", "tx") mesh: large frames run the
        # front-end dense flow spatially tiled across devices with halo
        # exchange (BASELINE config 5: multi-host tiled flow feeding the
        # pose-graph/BA back-end). Tiled flow uses the fast-path
        # saturation semantics (rtl_clamp); frame dims must divide the
        # mesh tiling. Runtime context only — not serialized; pass it
        # again to ``from_state``/``checkpoint.load`` on resume.
        self.mesh = mesh

        if mesh is not None:
            from tpuflow.sharding.tiled_pyramidal import (
                tiled_lucas_kanade_pyramidal,
            )

            self._flow_fn = jax.jit(
                lambda p, c: tuple(
                    x[0] for x in tiled_lucas_kanade_pyramidal(
                        p[None], c[None], mesh, backend=backend
                    )
                )
            )
        else:
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
        # Kept as a DEVICE array between frames: converting to NumPy
        # every frame costs a full-frame D2H sync per step (measured
        # 3 fps through the TPU tunnel vs the kernel-level 1600 fps at
        # 480p); state_dict materializes it on host at checkpoint time.
        self._prev_frame = None
        # Track lifecycle: each slot carries a landmark id; dead slots
        # are reseeded at keyframes with NEW landmark ids, so long
        # sequences keep a live observation stream instead of bleeding
        # out the initial seeding.
        self.track_lm: np.ndarray | None = None  # (N,) int32
        self.lm_first_uv: np.ndarray | None = None  # (n_landmarks, 2)
        self.lm_first_kf: np.ndarray | None = None  # (n_landmarks,) global idx
        self.n_landmarks = 0
        # Marginalization state (compact()): frozen trajectory prefix,
        # anchor poses for the kept window, and solved landmark positions
        # carried across compactions as initialization/scale memory.
        self.track_loss_frames: list[int] = []
        self._tracking_lost = False
        self._max_alive = 0  # healthy-level reference for loss detection
        self.frozen_kf: list[int] = []
        self.frozen_r = np.zeros((0, 3, 3), np.float32)
        self.frozen_t = np.zeros((0, 3), np.float32)
        self.anchor_r: np.ndarray | None = None  # (K_window, 3, 3)
        self.anchor_t: np.ndarray | None = None  # (K_window, 3)
        self.lm_xyz: np.ndarray | None = None    # (n_landmarks_kept, 3)

    # -- lifecycle ---------------------------------------------------------

    def start(self, first_frame: np.ndarray) -> None:
        """Seed features on the first frame and record keyframe 0."""
        import jax.numpy as jnp

        from tpuflow.vo import tracking

        frame = jnp.asarray(first_frame, jnp.float32)
        self._tracks = tracking.seed_grid(frame, grid_step=self.grid_step)
        self._prev_frame = frame
        self.frame_index = 0
        self.keyframes = [0]
        n = int(self._tracks.xy.shape[0])
        self.track_lm = np.arange(n, dtype=np.int32)
        self.lm_first_uv = np.asarray(self._tracks.xy, np.float32).copy()
        self.lm_first_kf = np.zeros(n, np.int32)
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
        self._prev_frame = cur
        self.frame_index += 1
        # Tracking-loss detection (total occlusion, violent motion,
        # dropped exposure): record the transition healthy -> lost so
        # consumers know the trajectory segments around it are not
        # metrically connected (reseeding restores tracking, but the
        # monocular scale/anchor across the gap is unobservable).
        # The threshold is relative to the session's PEAK alive count,
        # not the grid capacity: sparse-texture scenes where many grid
        # cells never seed would otherwise read as permanently "lost"
        # and mask real losses.
        alive_now = int(np.asarray(self._tracks.alive).sum())
        self._max_alive = max(self._max_alive, alive_now)
        lost = (
            self._max_alive > 0 and alive_now < 0.25 * self._max_alive
        )
        if lost and not self._tracking_lost:
            self._tracking_lost = True
            self.track_loss_frames.append(self.frame_index)
        elif not lost and self._tracking_lost:
            self._tracking_lost = False
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
        self.lm_first_kf = np.concatenate(
            [self.lm_first_kf,
             np.full(n_new, self.frame_index, np.int32)]
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
        if self.anchor_r is not None and self.anchor_r.shape[0] > 0:
            # Post-compaction: the chain continues from the anchored
            # first window pose (gauge continuity with the frozen prefix).
            pr[:] = self.anchor_r[0]
            pt[:] = self.anchor_t[0]
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

        # Initial poses: essential chain > compaction anchors > identity.
        if essential_init and k >= 2:
            pr0, pt0 = self._essential_initial_poses()
        elif self.anchor_r is not None:
            na = self.anchor_r.shape[0]
            pr0 = np.tile(np.eye(3, dtype=np.float32)[None], (k, 1, 1))
            pt0 = np.zeros((k, 3), np.float32)
            pr0[: min(na, k)] = self.anchor_r[:k]
            pt0[: min(na, k)] = self.anchor_t[:k]
            # Keyframes recorded after the last compact(): start at the
            # last anchored pose (better than identity; BA refines).
            for c in range(min(na, k), k):
                pr0[c] = pr0[c - 1]
                pt0[c] = pt0[c - 1]
        else:
            pr0 = np.tile(np.eye(3, dtype=np.float32)[None], (k, 1, 1))
            pt0 = np.zeros((k, 3), np.float32)

        # Initial landmarks: back-project each landmark's first
        # observation at the initialization depth *through the initial
        # pose of its spawning keyframe* (monocular scale convention;
        # reduces to the flat identity-frame back-projection when all
        # poses initialize at identity). Landmarks carried through
        # compact() instead reuse their previously solved positions.
        first = self.lm_first_uv
        n_lm = self.n_landmarks
        kf_ord = {g: i for i, g in enumerate(self.keyframes)}
        spawn_ord = np.asarray(
            [kf_ord.get(int(g), 0) for g in self.lm_first_kf], np.int32
        )
        ray = np.stack(
            [
                (first[:, 0] - cx) / fx * self.init_depth,
                (first[:, 1] - cy) / fy * self.init_depth,
                np.full(n_lm, self.init_depth, np.float32),
            ],
            axis=1,
        ).astype(np.float32)
        rs = pr0[spawn_ord]                       # (M, 3, 3)
        ts = pt0[spawn_ord]                       # (M, 3)
        landmarks = np.einsum("mij,mi->mj", rs, ray - ts).astype(np.float32)
        if self.lm_xyz is not None and self.lm_xyz.shape[0] > 0:
            nk = min(self.lm_xyz.shape[0], n_lm)
            landmarks[:nk] = self.lm_xyz[:nk]

        init_r = jnp.asarray(pr0)
        init_t = jnp.asarray(pt0)
        if essential_init and k >= 2:
            from tpuflow.vo import epipolar

            lm0 = epipolar.triangulate_landmarks(
                init_r, init_t,
                jnp.asarray(uv, jnp.float32), jnp.asarray(cam),
                jnp.asarray(lm_idx), jnp.asarray(valid),
                jnp.asarray(self.intrinsics, jnp.float32),
                n_landmarks=n_lm,
                fallback=jnp.asarray(landmarks),
            )
        else:
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
        elif (
            self.anchor_r is not None
            and self.anchor_r.shape[0] >= 2
            and k >= 2
        ):
            # Post-compaction gauge: the anchored first two window poses
            # pin the full 7-DOF monocular gauge (pose + scale), keeping
            # the frozen prefix and the refined window in one frame.
            fixed = (0, 1)
        else:
            fixed = (0,)
        solved = ba.solve(
            problem, iterations=ba_iterations, fixed_cams=fixed
        )
        err = ba.reprojection_errors(solved)
        alive = np.asarray(problem.obs_valid)
        mean_err = float(np.asarray(err)[alive].mean()) if alive.any() else 0.0

        return OdometryResult(
            poses_r=np.concatenate(
                [self.frozen_r, np.asarray(solved.poses_r)]
            ),
            poses_t=np.concatenate(
                [self.frozen_t, np.asarray(solved.poses_t)]
            ),
            landmarks=np.asarray(solved.landmarks),
            keyframe_indices=self.frozen_kf + list(self.keyframes),
            track_count=int(np.asarray(self._tracks.alive).sum()),
            mean_reprojection_error=mean_err,
            track_loss_frames=list(self.track_loss_frames),
        )

    def compact(
        self,
        keep_last: int,
        ba_iterations: int = 8,
        essential_init: bool = False,
    ) -> None:
        """Marginalize keyframes older than the last ``keep_last``.

        Bounded-memory sliding-window sessions (SURVEY.md §5 has no
        reference counterpart — this is back-end machinery): solve BA
        over the current window once, then (1) freeze the solved poses of
        the keyframes leaving the window into the trajectory prefix,
        (2) drop their observation records, (3) remap landmark ids so
        only window-visible + live-track landmarks remain (the memory
        bound), and (4) anchor the kept poses and carry the solved
        landmark positions as the next solve's initialization and
        gauge/scale memory. This is marginalization by fixation (drop +
        anchor, the DSO-style approximation), not a dense Schur prior:
        correlations between dropped and kept states are approximated by
        pinning the first two kept poses.
        """
        k = len(self.keyframes)
        if k <= keep_last:
            return
        res = self.solve(
            ba_iterations=ba_iterations, essential_init=essential_init
        )
        nf = len(self.frozen_kf)
        win_r = res.poses_r[nf:]
        win_t = res.poses_t[nf:]
        ndrop = k - keep_last

        self.frozen_kf += self.keyframes[:ndrop]
        self.frozen_r = np.concatenate([self.frozen_r, win_r[:ndrop]])
        self.frozen_t = np.concatenate([self.frozen_t, win_t[:ndrop]])
        self.keyframes = self.keyframes[ndrop:]
        self.obs_uv = self.obs_uv[ndrop:]
        self.obs_lm = self.obs_lm[ndrop:]
        self.obs_valid = self.obs_valid[ndrop:]
        self.anchor_r = win_r[ndrop:].copy()
        self.anchor_t = win_t[ndrop:].copy()

        # Landmark compaction: keep ids observed (validly) in the window
        # or carried by a live track slot; remap to dense ids.
        used = [lm[v] for lm, v in zip(self.obs_lm, self.obs_valid)]
        alive = np.asarray(self._tracks.alive)
        used.append(self.track_lm[alive])
        kept = np.unique(np.concatenate(used)).astype(np.int32)
        old2new = np.full(self.n_landmarks, -1, np.int32)
        old2new[kept] = np.arange(len(kept), dtype=np.int32)
        for i in range(len(self.obs_lm)):
            m = old2new[self.obs_lm[i]]
            self.obs_valid[i] = self.obs_valid[i] & (m >= 0)
            self.obs_lm[i] = np.where(m >= 0, m, 0).astype(np.int32)
        tm = old2new[self.track_lm]
        self.track_lm = np.where(tm >= 0, tm, 0).astype(np.int32)
        self.lm_first_uv = self.lm_first_uv[kept]
        self.lm_first_kf = self.lm_first_kf[kept]
        self.lm_xyz = res.landmarks[kept].astype(np.float32)
        self.n_landmarks = len(kept)

    # -- checkpointable state ---------------------------------------------

    def state_dict(self) -> dict:
        """Array-only pytree capturing the full resumable state."""
        from tpuflow.vo import tracking  # noqa: F401  (Tracks fields below)

        t = self._tracks
        state = {
            "frame_index": np.int64(self.frame_index),
            "keyframes": np.asarray(self.keyframes, np.int64),
            # One convention for every optional array: OMITTED while
            # empty (the size filter below — Orbax rejects zero-size
            # arrays), defaulted by ``from_state``.
            "track_loss_frames": np.asarray(self.track_loss_frames, np.int64),
            "tracking_lost": np.int64(self._tracking_lost),
            "max_alive": np.int64(self._max_alive),
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
            "lm_first_kf": np.asarray(self.lm_first_kf, np.int32),
            "n_landmarks": np.int64(self.n_landmarks),
            # Marginalization state. Keys are OMITTED while unset
            # (fresh sessions, pre-compact()): Orbax rejects zero-size
            # arrays, and ``from_state`` defaults every absent key to
            # the empty/None initial state.
            "frozen_kf": np.asarray(self.frozen_kf, np.int64),
            "frozen_r": self.frozen_r,
            "frozen_t": self.frozen_t,
            "anchor_r": self.anchor_r,
            "anchor_t": self.anchor_t,
            "lm_xyz": self.lm_xyz,
        }
        return {
            k: v
            for k, v in state.items()
            if v is not None and (not isinstance(v, np.ndarray) or v.size)
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
            "tiled": self.mesh is not None,
        }

    @classmethod
    def from_state(cls, meta: dict, state: dict, mesh=None) -> "OdometrySession":
        import jax.numpy as jnp

        from tpuflow.vo import tracking

        # Tiled and untiled flow differ in saturation semantics
        # (rtl_clamp vs golden); silently switching on resume would
        # break the bit-identical-resume contract.
        was_tiled = bool(meta.get("tiled", False))
        if was_tiled and mesh is None:
            raise ValueError(
                "this session used mesh-tiled flow; pass the mesh to "
                "from_state/checkpoint.load to resume (tiled flow's "
                "saturation semantics differ from the untiled default)"
            )
        if not was_tiled and mesh is not None:
            raise ValueError(
                "this session used untiled flow; resuming with a mesh "
                "would switch flow semantics mid-session"
            )
        sess = cls(
            intrinsics=meta["intrinsics"],
            keyframe_stride=meta["keyframe_stride"],
            grid_step=meta["grid_step"],
            init_depth=meta["init_depth"],
            backend=meta["backend"],
            fb_check_threshold=meta.get("fb_check_threshold"),
            mesh=mesh,
        )
        sess.frame_index = int(state["frame_index"])
        sess.keyframes = [int(x) for x in np.asarray(state["keyframes"])]
        # The >= 0 filter also accepts pre-round-3 checkpoints that
        # encoded "empty" as a [-1] sentinel instead of an omitted key.
        sess.track_loss_frames = [
            int(x) for x in np.asarray(state.get("track_loss_frames", []))
            if int(x) >= 0
        ]
        sess._tracking_lost = bool(int(state.get("tracking_lost", 0)))
        sess._max_alive = int(state.get("max_alive", 0))
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
        sess.lm_first_kf = np.asarray(
            state.get("lm_first_kf", np.zeros(len(sess.lm_first_uv))),
            np.int32,
        )
        sess.n_landmarks = int(state["n_landmarks"])
        sess.frozen_kf = [
            int(x) for x in np.asarray(state.get("frozen_kf", []))
        ]
        sess.frozen_r = np.asarray(
            state.get("frozen_r", np.zeros((0, 3, 3))), np.float32
        )
        sess.frozen_t = np.asarray(
            state.get("frozen_t", np.zeros((0, 3))), np.float32
        )
        anchor_r = np.asarray(
            state.get("anchor_r", np.zeros((0, 3, 3))), np.float32
        )
        anchor_t = np.asarray(
            state.get("anchor_t", np.zeros((0, 3))), np.float32
        )
        sess.anchor_r = anchor_r if anchor_r.shape[0] else None
        sess.anchor_t = anchor_t if anchor_t.shape[0] else None
        lm_xyz = np.asarray(state.get("lm_xyz", np.zeros((0, 3))), np.float32)
        sess.lm_xyz = lm_xyz if lm_xyz.shape[0] else None
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
    fb_check_threshold: float | None = None,
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
        fb_check_threshold=fb_check_threshold,
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
    loop_closure: bool = False,
    loop_threshold: float = 0.95,
    loop_min_separation: int = 4,
    loop_weight: float = 5.0,
    motion_prior_weight: float = 0.0,
    fb_check_threshold: float | None = None,
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

    ``loop_closure``: detect appearance-based revisits
    (tpuflow.vo.loop_closure thumbnail descriptors, cosine >=
    ``loop_threshold``, at least ``loop_min_separation`` keyframes
    apart), measure each pair's relative pose from dense flow +
    essential decomposition, and add the edges (information scale
    ``loop_weight``) to the pose graph — cancelling odometry drift on
    revisits.

    ``motion_prior_weight``: if > 0, append soft constant-velocity
    edges (pose_graph.constant_velocity_edges) that regularize
    keyframes with weak constraints toward the smooth trajectory
    predicted by their neighbors.
    """
    import jax
    import jax.numpy as jnp

    from tpuflow.flow import lucas_kanade_pyramidal
    from tpuflow.vo import loop_closure as lc
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
    # Loss frames are detected per chunk with LOCAL frame indices;
    # collect them as global indices, deduping across chunk overlaps
    # (the same occluded frame is seen by up to two chunks).
    loss_frames: set[int] = set()
    for s in starts:
        res = run_odometry(
            frames[s : s + chunk_size], intrinsics,
            grid_step=grid_step, init_depth=init_depth,
            ba_iterations=ba_iterations, backend=backend,
            fb_check_threshold=fb_check_threshold,
        )
        last_result = res
        loss_frames.update(s + f for f in res.track_loss_frames)
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

    # Loop closures: appearance retrieval over keyframe thumbnails, then
    # a measured relative-pose edge per accepted revisit pair.
    loop_edges: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    if loop_closure and k > loop_min_separation:
        descs = np.stack(
            [lc.keyframe_descriptor(frames[g]) for g in nodes]
        )
        pairs = lc.detect_loops(
            descs,
            min_separation=loop_min_separation,
            threshold=loop_threshold,
        )
        flow_fn = jax.jit(
            lambda p, c: lucas_kanade_pyramidal(p, c, backend=backend)
        )
        for i, j, _sim in pairs:
            gi, gj = nodes[i], nodes[j]
            if (gi, gj) in edges:
                continue
            measured = lc.loop_edge(
                frames[gi], frames[gj], intrinsics, flow_fn,
                depth=init_depth, grid_step=grid_step,
            )
            if measured is not None:
                loop_edges[(gi, gj)] = (measured[0], measured[1])
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

    all_edges = dict(edges)
    all_edges.update(loop_edges)
    weights = np.concatenate(
        [
            np.ones(len(edges), np.float32),
            np.full(len(loop_edges), loop_weight, np.float32),
        ]
    )
    ei = np.asarray([idx[a] for (a, _b) in all_edges], np.int32)
    ej = np.asarray([idx[b] for (_a, b) in all_edges], np.int32)
    er = np.stack([e[0] for e in all_edges.values()])
    et = np.stack([e[1] for e in all_edges.values()])
    g = pose_graph.PoseGraph(
        poses_r=jnp.asarray(pr),
        poses_t=jnp.asarray(pt),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_r=jnp.asarray(er),
        edge_t=jnp.asarray(et),
        edge_valid=jnp.ones(len(all_edges), bool),
        edge_weight=jnp.asarray(weights),
    )
    if motion_prior_weight > 0.0:
        # Soft constant-velocity prior anchored to the odometry-chained
        # initialization (pose_graph.constant_velocity_edges docstring).
        g = pose_graph.constant_velocity_edges(g, motion_prior_weight)
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
        track_loss_frames=sorted(loss_frames),
    )
