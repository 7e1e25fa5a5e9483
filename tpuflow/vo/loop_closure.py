"""Appearance-based loop-closure detection for the VO back-end.

Closes the classic SLAM loop: keyframes get a compact appearance
descriptor (mean-pooled, illumination-normalized thumbnail — a
place-recognition retrieval key, cheap enough to compute per keyframe on
the host), candidate revisits are found by cosine similarity with a
temporal-separation guard, and each accepted pair contributes a
relative-pose edge to the pose graph (tpuflow.vo.pose_graph), which is
what cancels accumulated odometry drift.

No reference counterpart (/root/reference stops at dense flow).

Monocular scale caveat: a monocular loop edge's translation magnitude is
not observable from the pair alone (SE(3) pose graph, not Sim(3)). The
edge translation is recovered from the median dense-flow shift at the
session's depth gauge (``depth / f``), which is exact for locally
fronto-parallel structure and a good approximation for the small-baseline
revisits loop closure exists to catch; rotation comes from the essential
decomposition when the pair has real baseline.
"""

from __future__ import annotations

import numpy as np


def keyframe_descriptor(frame: np.ndarray, size: int = 16) -> np.ndarray:
    """(H, W) grayscale -> (size*size,) L2-normalized thumbnail descriptor.

    Mean-pool to a size x size thumbnail (cropping the remainder), then
    zero-mean / unit-norm so matching is invariant to global gain and
    offset changes.
    """
    f = np.asarray(frame, np.float32)
    h, w = f.shape
    by, bx = max(h // size, 1), max(w // size, 1)
    gy, gx = h // by, w // bx
    pooled = (
        f[: gy * by, : gx * bx]
        .reshape(gy, by, gx, bx)
        .mean(axis=(1, 3))
    )
    # Center-crop the pooled grid to exactly (size, size).
    oy = max((gy - size) // 2, 0)
    ox = max((gx - size) // 2, 0)
    pooled = pooled[oy : oy + size, ox : ox + size]
    d = pooled.reshape(-1)
    d = d - d.mean()
    n = np.linalg.norm(d)
    return (d / n if n > 1e-9 else d).astype(np.float32)


def detect_loops(
    descriptors: np.ndarray,
    min_separation: int = 4,
    threshold: float = 0.95,
    max_pairs: int = 8,
) -> list[tuple[int, int, float]]:
    """Find revisit candidates among (K, D) keyframe descriptors.

    Returns up to ``max_pairs`` (i, j, similarity) with j - i >=
    ``min_separation`` and cosine similarity above ``threshold``,
    greedily: each j is matched to its single best earlier i, pairs
    sorted by similarity. The separation guard keeps trivially-similar
    consecutive keyframes from masquerading as loops.
    """
    k = len(descriptors)
    if k < min_separation + 1:
        return []
    sim = descriptors @ descriptors.T
    pairs: list[tuple[int, int, float]] = []
    for j in range(min_separation, k):
        cands = sim[j, : j - min_separation + 1]
        i = int(np.argmax(cands))
        s = float(cands[i])
        if s >= threshold:
            pairs.append((i, j, s))
    pairs.sort(key=lambda p: -p[2])
    return pairs[:max_pairs]


def loop_edge(
    frame_i: np.ndarray,
    frame_j: np.ndarray,
    intrinsics,
    flow_fn,
    depth: float = 5.0,
    grid_step: int = 16,
    fb_threshold: float = 1.5,
    min_baseline_px: float = 2.0,
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Measure the relative pose (R_ij, t_ij) of a loop pair.

    Runs dense flow i->j (``flow_fn``), advances grid-seeded tracks,
    culls with a forward-backward check, then:

    - median displacement < ``min_baseline_px``: near-zero-baseline
      revisit — rotation from the essential decomposition is degenerate,
      so R = I and t = median shift lifted through ``depth`` (see module
      docstring).
    - otherwise: rotation + translation direction from the robust
      essential pipeline (tpuflow.vo.epipolar), translation magnitude
      from the median shift at ``depth``.

    Returns None when too few correspondences survive (no edge).
    """
    import jax.numpy as jnp

    from tpuflow.vo import epipolar, tracking

    fi = jnp.asarray(frame_i, jnp.float32)
    fj = jnp.asarray(frame_j, jnp.float32)
    u, v = flow_fn(fi, fj)
    tracks = tracking.seed_grid(fi, grid_step=grid_step)
    prev_xy = tracks.xy
    adv = tracking.advance(tracks, u, v)
    ub, vb = flow_fn(fj, fi)
    adv = tracking.forward_backward_check(
        adv, prev_xy, ub, vb, threshold=fb_threshold
    )
    alive = np.asarray(adv.alive)
    if int(alive.sum()) < 16:
        return None
    uv1 = np.asarray(prev_xy, np.float32)
    uv2 = np.asarray(adv.xy, np.float32)
    fx, fy = float(intrinsics[0]), float(intrinsics[1])
    d = (uv2 - uv1)[alive]
    med = np.median(d, axis=0)
    shift = float(np.hypot(*med))
    # Image content shifting by (dx, dy) at depth Z <=> camera translating
    # by -(dx*Z/fx, dy*Z/fy) <=> t_ij = +(dx*Z/fx, dy*Z/fy) (world->camera
    # convention: x_j = R x_i + t).
    t_flow = np.asarray(
        [med[0] * depth / fx, med[1] * depth / fy, 0.0], np.float32
    )
    if shift < min_baseline_px:
        return np.eye(3, dtype=np.float32), t_flow, int(alive.sum())
    init = epipolar.two_view_init(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(alive),
        jnp.asarray(
            [intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]],
            jnp.float32,
        ),
    )
    if int(init.n_good) < max(16, 0.5 * int(alive.sum())):
        return None
    t_dir = np.asarray(init.t)
    mag = float(np.linalg.norm(t_flow))
    return np.asarray(init.r), (t_dir * mag).astype(np.float32), int(
        init.n_good
    )
