"""Keyframe pose-graph optimization (SE(3) relative-pose constraints).

Gauss-Newton over keyframe poses with edges measuring relative
transforms (odometry from tracked flow, loop closures). Jacobians via
``jax.jacfwd`` at the identity tangent, dense normal equations
(6K x 6K — keyframe counts are small), gauge fixed with a prior on node
0. Fully jittable with a fixed-size edge table + validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuflow.vo import se3
from tpuflow.vo._precision import pin_matmul_precision


class PoseGraph(NamedTuple):
    poses_r: jax.Array   # (K, 3, 3)
    poses_t: jax.Array   # (K, 3)
    edge_i: jax.Array    # (E,) int32 source node
    edge_j: jax.Array    # (E,) int32 target node
    edge_r: jax.Array    # (E, 3, 3) measured R_ij (i -> j)
    edge_t: jax.Array    # (E, 3) measured t_ij
    edge_valid: jax.Array  # (E,) bool
    edge_weight: jax.Array  # (E,) float32 information scale
    # Optional (E, 6) per-component residual mask in (t, rot) tangent
    # order. None = all components constrained (ordinary SE(3) edges).
    # Rotation-only factors (e.g. gyro-preintegration edges, vo.imu)
    # use [0,0,0,1,1,1] so the unobserved translation exerts no force.
    edge_mask: jax.Array | None = None


def _mask_of(g: "PoseGraph") -> jax.Array:
    if g.edge_mask is None:
        return jnp.ones((g.edge_i.shape[0], 6), jnp.float32)
    return g.edge_mask


def _edge_residual(xi_i, xi_j, ri, ti, rj, tj, rm, tm):
    """log( Z_ij^-1 * T_i^-1 * T_j ) with tangent perturbations applied."""
    ri2, ti2 = se3.retract(ri, ti, xi_i)
    rj2, tj2 = se3.retract(rj, tj, xi_j)
    rrel, trel = se3.compose(*se3.inverse(ri2, ti2), rj2, tj2)
    rerr, terr = se3.compose(*se3.inverse(rm, tm), rrel, trel)
    return jnp.concatenate([terr, se3.so3_log(rerr)])


def residuals(g: PoseGraph) -> jax.Array:
    """(E, 6) constraint residuals (invalid edges read 0)."""
    zero = jnp.zeros(6)

    def one(i, j, rm, tm):
        return _edge_residual(
            zero, zero, g.poses_r[i], g.poses_t[i], g.poses_r[j], g.poses_t[j],
            rm, tm,
        )

    r = jax.vmap(one)(g.edge_i, g.edge_j, g.edge_r, g.edge_t) * _mask_of(g)
    return jnp.where(g.edge_valid[:, None], r, 0.0)


@functools.partial(jax.jit, static_argnames=("num_nodes",))
@pin_matmul_precision
def gauss_newton_step(
    g: PoseGraph, damping: float = 1e-6, num_nodes: int | None = None
) -> PoseGraph:
    k = num_nodes or g.poses_r.shape[0]
    zero = jnp.zeros(6)

    def one(i, j, rm, tm):
        args = (g.poses_r[i], g.poses_t[i], g.poses_r[j], g.poses_t[j], rm, tm)
        r = _edge_residual(zero, zero, *args)
        ji = jax.jacfwd(_edge_residual, argnums=0)(zero, zero, *args)
        jj = jax.jacfwd(_edge_residual, argnums=1)(zero, zero, *args)
        return r, ji, jj

    res, ji, jj = jax.vmap(one)(g.edge_i, g.edge_j, g.edge_r, g.edge_t)
    mask = _mask_of(g)
    res = res * mask
    ji = ji * mask[:, :, None]
    jj = jj * mask[:, :, None]
    w = jnp.where(g.edge_valid, g.edge_weight, 0.0)

    hii = jnp.einsum("eia,eib->eab", ji, ji) * w[:, None, None]
    hjj = jnp.einsum("eia,eib->eab", jj, jj) * w[:, None, None]
    hij = jnp.einsum("eia,eib->eab", ji, jj) * w[:, None, None]
    bi = -jnp.einsum("eia,ei->ea", ji, res) * w[:, None]
    bj = -jnp.einsum("eia,ei->ea", jj, res) * w[:, None]

    h = jnp.zeros((k, 6, k, 6))
    h = h.at[g.edge_i, :, g.edge_i, :].add(hii)
    h = h.at[g.edge_j, :, g.edge_j, :].add(hjj)
    h = h.at[g.edge_i, :, g.edge_j, :].add(hij)
    h = h.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(hij, 1, 2))
    b = jnp.zeros((k, 6)).at[g.edge_i].add(bi).at[g.edge_j].add(bj)

    hd = h.reshape(6 * k, 6 * k) + damping * jnp.eye(6 * k)
    # Gauge fixing by exact elimination: node 0 gets dx = 0.
    hd = hd.at[:6, :].set(0.0).at[:, :6].set(0.0).at[:6, :6].set(jnp.eye(6))
    bb = b.reshape(6 * k).at[:6].set(0.0)

    dx = jnp.linalg.solve(hd, bb).reshape(k, 6)
    new_r, new_t = jax.vmap(se3.retract)(g.poses_r, g.poses_t, dx)
    return g._replace(poses_r=new_r, poses_t=new_t)


def solve(g: PoseGraph, iterations: int = 10, damping: float = 1e-6) -> PoseGraph:
    for _ in range(iterations):
        g = gauss_newton_step(g, damping=damping)
    return g


def constant_velocity_edges(g: PoseGraph, weight: float = 0.25) -> PoseGraph:
    """Append soft constant-velocity motion-prior edges.

    For every consecutive node triple (k-1, k, k+1), adds an edge
    (k, k+1) whose measurement is the CURRENT estimate of the previous
    relative pose ``T_{k-1}^-1 T_k`` — i.e. the prediction "the camera
    keeps doing what it just did". With a small ``weight`` relative to
    the odometry/loop edges (default 0.25) this regularizes keyframes
    whose own constraints are weak (dropped tracks, low texture)
    without fighting well-constrained ones. The measurement anchors to
    the estimate at call time, so append these AFTER initializing poses
    from odometry and BEFORE ``solve()`` (the smoothing prior of
    classical VO/SLAM pipelines; no reference counterpart — the
    reference stops at dense flow).
    """
    k = g.poses_r.shape[0]
    if k < 3:
        return g

    def rel(i):
        return se3.compose(
            *se3.inverse(g.poses_r[i], g.poses_t[i]),
            g.poses_r[i + 1], g.poses_t[i + 1],
        )

    idx = jnp.arange(k - 2, dtype=jnp.int32)
    pred_r, pred_t = jax.vmap(rel)(idx)  # rel(k-1 -> k) predicts (k, k+1)
    return g._replace(
        edge_i=jnp.concatenate([g.edge_i, idx + 1]),
        edge_j=jnp.concatenate([g.edge_j, idx + 2]),
        edge_r=jnp.concatenate([g.edge_r, pred_r]),
        edge_t=jnp.concatenate([g.edge_t, pred_t]),
        edge_valid=jnp.concatenate(
            [g.edge_valid, jnp.ones(k - 2, bool)]
        ),
        edge_weight=jnp.concatenate(
            [g.edge_weight, jnp.full(k - 2, float(weight), jnp.float32)]
        ),
        edge_mask=None if g.edge_mask is None else jnp.concatenate(
            [g.edge_mask, jnp.ones((k - 2, 6), jnp.float32)]
        ),
    )
