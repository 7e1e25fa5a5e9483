"""S8.7 fixed-point Lucas-Kanade — an RTL-equivalent numerical mode.

Emulates the reference accelerator's integer datapath exactly (the
second implementation of the reference's Python-vs-RTL dual; SURVEY.md
§7 step 8), so tpuflow can cross-check against the hardware's published
behavior (README.md:386-395: 0.76 px mean u on the 2 px test vs the
float model's 1.34):

- frame average ``(prev + curr) >> 1`` (integer floor;
  rtl/unopt/gradient_compute.sv:117)
- Sobel column/row sums then arithmetic ``>>> 3`` (floor toward -inf;
  gradient_compute.sv:122-137), S12 gradients
- temporal difference on the center pixel (gradient_compute.sv:140)
- 25 S12xS12 products summed into S32 accumulators
  (rtl/unopt/window_accumulator.sv:112-167)
- det / numerators: S32xS32 products **truncated to the low 32 bits**
  (the RTL's ``prod[ACCUM_WIDTH-1:0]`` slice, flow_solver.sv:117-121 —
  genuine wraparound on textured images, part of why the RTL
  underestimates), ``|det| > 1000`` gate (flow_solver.sv:45,124),
  ``(num << 7) / det`` truncating signed division, clamp to +-1024
  (+-8.0 px in S8.7; flow_solver.sv:126-149)

Border semantics: the streaming RTL only emits flow where full gradient
and accumulation windows exist; here the 3-pixel border is zero (same
interior values, simpler edges).

All integer ops run as int32 lanes on the VPU — this mode is also the
template for a quantized high-throughput deployment path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DET_THRESHOLD = 1000
FRAC_BITS = 7
FLOW_CLAMP = 1024  # +-8.0 px in S8.7


def _trunc_div(num: jax.Array, den: jax.Array) -> jax.Array:
    """SystemVerilog signed '/': truncation toward zero (int64)."""
    q = jnp.abs(num) // jnp.abs(den)
    return jnp.sign(num) * jnp.sign(den) * q


@functools.partial(jax.jit, static_argnames=("window_size",))
def lucas_kanade_s87(
    frame_prev_u8: jax.Array,
    frame_curr_u8: jax.Array,
    window_size: int = 5,
) -> tuple[jax.Array, jax.Array]:
    """RTL-datapath dense flow.

    Inputs: (H, W) uint8 frames. Returns float32 (u, v) in pixels
    (S8.7 codes divided by 128, matching the testbench conversion
    tb/tb_optical_flow_top.sv:111-115).
    """
    p = frame_prev_u8.astype(jnp.int32)
    c = frame_curr_u8.astype(jnp.int32)
    h, w = p.shape

    avg = (p + c) >> 1  # 9-bit integer average, floor

    # 3x3 Sobel region (interior only, like the streaming line buffers).
    gh, gw = h - 2, w - 2

    def sh(a, dy, dx):
        return jax.lax.slice(a, (1 + dy, 1 + dx), (1 + dy + gh, 1 + dx + gw))

    sob_x = (
        -sh(avg, -1, -1) - 2 * sh(avg, 0, -1) - sh(avg, 1, -1)
        + sh(avg, -1, 1) + 2 * sh(avg, 0, 1) + sh(avg, 1, 1)
    )
    ix = sob_x >> 3  # arithmetic shift: floor division by 8
    sob_y = (
        -sh(avg, -1, -1) - 2 * sh(avg, -1, 0) - sh(avg, -1, 1)
        + sh(avg, 1, -1) + 2 * sh(avg, 1, 0) + sh(avg, 1, 1)
    )
    iy = sob_y >> 3
    it = sh(p, 0, 0) - sh(c, 0, 0)

    # 5x5 window sums of the five S12xS12 product planes -> S32.
    half = window_size // 2

    def wsum(a):
        oh, ow = gh - 2 * half, gw - 2 * half
        out = None
        for dy in range(window_size):
            for dx in range(window_size):
                t = jax.lax.slice(a, (dy, dx), (dy + oh, dx + ow))
                out = t if out is None else out + t
        return out

    s_xx = wsum(ix * ix)
    s_yy = wsum(iy * iy)
    s_xy = wsum(ix * iy)
    s_xt = wsum(ix * it)
    s_yt = wsum(iy * it)

    # RTL truncates the 64-bit products to 32 bits: identical to int32
    # wraparound multiplication.
    det = s_xx * s_yy - s_xy * s_xy
    num_u = s_yy * s_xt - s_xy * s_yt
    num_v = s_xx * s_yt - s_xy * s_xt

    solvable = (det > DET_THRESHOLD) | (det < -DET_THRESHOLD)
    safe_det = jnp.where(solvable, det, 1).astype(jnp.int64)
    fu = _trunc_div(num_u.astype(jnp.int64) << FRAC_BITS, safe_det)
    fv = _trunc_div(num_v.astype(jnp.int64) << FRAC_BITS, safe_det)
    fu = jnp.clip(fu, -FLOW_CLAMP, FLOW_CLAMP)
    fv = jnp.clip(fv, -FLOW_CLAMP, FLOW_CLAMP)
    fu = jnp.where(solvable, fu, 0)
    fv = jnp.where(solvable, fv, 0)

    pad = ((half + 1, half + 1), (half + 1, half + 1))
    u = jnp.pad(fu.astype(jnp.float32) / (1 << FRAC_BITS), pad)
    v = jnp.pad(fv.astype(jnp.float32) / (1 << FRAC_BITS), pad)
    return u, v


def box_downsample_2x(frame_u8: jax.Array) -> jax.Array:
    """The RTL pyramid builder's 2x2 box-average downsample
    (rtl/unopt/pyramid_builder.sv:10-17) — integer mean of each 2x2
    block, floor."""
    f = frame_u8.astype(jnp.int32)
    h, w = f.shape
    blocks = f[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2)
    return (blocks.sum(axis=(1, 3)) >> 2).astype(frame_u8.dtype)
