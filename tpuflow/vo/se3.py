"""SE(3) / SO(3) utilities for the visual-odometry back-end.

Minimal, jit/vmap-friendly Lie-group helpers: rotations as 3x3 matrices,
tangent vectors as (6,) = (rho, phi) with translation first. No reference
counterpart (the reference stops at dense flow); built for
tpuflow.vo.pose_graph and tpuflow.vo.ba.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (3,) -> (3, 3) skew-symmetric."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: (3,) rotation vector -> (3, 3) rotation matrix.

    Taylor-guarded near zero so it is safe under jit/grad.
    """
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS)
    k = hat(phi)
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    return jnp.eye(3) + a * k + b * (k @ k)


def so3_log(r: jax.Array) -> jax.Array:
    """(3, 3) rotation matrix -> (3,) rotation vector."""
    cos_theta = jnp.clip((jnp.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    scale = jnp.where(theta > 1e-6, theta / (2.0 * jnp.sin(theta) + _EPS), 0.5)
    return scale * w


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(6,) = (rho, phi) -> (R, t). First-order-exact V matrix."""
    rho, phi = xi[:3], xi[3:]
    r = so3_exp(phi)
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS)
    k = hat(phi)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0
    )
    v = jnp.eye(3) + b * k + c * (k @ k)
    return r, v @ rho


def compose(ra, ta, rb, tb) -> tuple[jax.Array, jax.Array]:
    """(Ra, ta) * (Rb, tb)."""
    return ra @ rb, ra @ tb + ta


def inverse(r, t) -> tuple[jax.Array, jax.Array]:
    rt = r.T
    return rt, -(rt @ t)


def transform(r, t, points: jax.Array) -> jax.Array:
    """Apply (R, t) to (..., 3) points."""
    return points @ r.T + t


def retract(r, t, xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Left-multiplicative update: exp(xi) * (R, t)."""
    dr, dt = se3_exp(xi)
    return compose(dr, dt, r, t)


def so3_right_jacobian(phi: jax.Array) -> jax.Array:
    """Right Jacobian of SO(3): d Exp(phi + d) ~= Exp(phi) Exp(Jr(phi) d).

    Taylor-guarded near zero (Jr -> I - 0.5 hat(phi)); used by the
    IMU-preintegration bias Jacobians (tpuflow.vo.imu).
    """
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS)
    k = hat(phi)
    a = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / (theta2 + _EPS), 0.5
    )
    b = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2 * theta + _EPS),
        1.0 / 6.0,
    )
    return jnp.eye(3) - a * k + b * (k @ k)
