"""Fused single-scale Lucas-Kanade Pallas TPU kernel.

The headline kernel: the reference RTL's streaming pipeline
gradient_compute -> window_accumulator -> flow_solver
(rtl/unopt/gradient_compute.sv, window_accumulator.sv, flow_solver.sv —
two line-buffer stages, 125 DSP products/cycle, and a combinational
divider) re-designed as ONE VMEM-resident pass per row-slab:

    HBM reads:  two frames, once each (plus an 8-row halo per slab)
    VMEM:       averaged frame -> Sobel gradients -> 5 gradient-product
                planes -> separable 5x5 window sums -> Cramer solve
    HBM writes: (u, v), once

The RTL's line buffers become a double-buffered slab pipeline (grid
steps run sequentially per core with persistent scratch, so each step
prefetches the next slab while computing the current one); its DSP
array becomes VPU elementwise math; its BRAM port arbitration disappears
(no shared-port hazards in VMEM). Numerics match tpuflow.kernels.jnp_ref
in f32 (equivalence-tested in tests/test_pallas_kernels.py).

Batching: the kernel is natively batched over a flattened
(batch * row_tiles) grid, and the public entry registers a
``jax.custom_batching.custom_vmap`` rule, so ``vmap`` over frame
streams (BASELINE.json config 4, "batched streams") maps onto the
batched grid instead of failing on the manual-DMA input specs.

Roofline: ~190 f32 FLOPs/pixel against 16 B/pixel of HBM traffic
(2 frame reads + 2 flow writes) => arithmetic intensity ~12 FLOP/B,
HBM-bound on v5e (~819 GB/s).

Geometry (all static):
    APRON = 4 rows/cols per side = Sobel halo (1) + window halo (2) + 1
    alignment spare, so every DMA slab is a multiple of 8 sublanes.
    padded P = zeropad3(symmpad1(frame)), extended to gridded height;
    P row p == image row p - APRON.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

APRON = 4


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lk_kernel(prev_hbm, curr_hbm, u_ref, v_ref, bufs, sems,
               *, n_tiles: int, tile_rows: int, height: int, width: int,
               window: int, det_threshold: float):
    # Double-buffered slab pipeline over the flattened (batch, tile) grid.
    s = pl.program_id(0)
    n = pl.num_programs(0)
    slab_h = tile_rows + 2 * APRON
    slot = jax.lax.rem(s, 2)
    nslot = jax.lax.rem(s + 1, 2)

    def copies(step, sl):
        bb = step // n_tiles
        r = (step % n_tiles) * tile_rows
        return (
            pltpu.make_async_copy(
                prev_hbm.at[bb, pl.ds(r, slab_h), :], bufs.at[0, sl],
                sems.at[0, sl],
            ),
            pltpu.make_async_copy(
                curr_hbm.at[bb, pl.ds(r, slab_h), :], bufs.at[1, sl],
                sems.at[1, sl],
            ),
        )

    @pl.when(s == 0)
    def _():
        for cp in copies(s, slot):
            cp.start()

    @pl.when(s + 1 < n)
    def _():
        for cp in copies(s + 1, nslot):
            cp.start()

    for cp in copies(s, slot):
        cp.wait()

    p = bufs[0, slot]
    c = bufs[1, slot]
    avg = (p + c) * 0.5

    # Sobel on the averaged frame (true convolution == correlation with the
    # flipped kernel; reference python/lucas_kanade_core.py:31-40).
    # Gradient region covers image rows [r0-2, r0+TH+2) -> slab rows
    # [2, TH+6); same for columns -> (TH+4, W+4).
    half = window // 2
    gh = tile_rows + 2 * half
    gw = width + 2 * half
    base = APRON - half  # >= 1 for window <= 7

    def sh(dy, dx):  # shifted slab view over the gradient region
        return jax.lax.slice(
            avg, (base + dy, base + dx), (base + dy + gh, base + dx + gw)
        )

    ix = (
        (sh(-1, -1) - sh(-1, 1))
        + 2.0 * (sh(0, -1) - sh(0, 1))
        + (sh(1, -1) - sh(1, 1))
    ) * 0.125
    iy = (
        (sh(-1, -1) - sh(1, -1))
        + 2.0 * (sh(-1, 0) - sh(1, 0))
        + (sh(-1, 1) - sh(1, 1))
    ) * 0.125
    it = jax.lax.slice(p, (base, base), (base + gh, base + gw)) - jax.lax.slice(
        c, (base, base), (base + gh, base + gw)
    )

    # Separable window sums of the 5 structure-tensor planes (the RTL's
    # 125-DSP window_accumulator, rtl/unopt/window_accumulator.sv:112-167).
    def wsum(a):
        rows = a[0:tile_rows, :]
        for d in range(1, window):
            rows = rows + a[d : tile_rows + d, :]
        out = jax.lax.slice(rows, (0, 0), (tile_rows, width))
        for d in range(1, window):
            out = out + jax.lax.slice(rows, (0, d), (tile_rows, width + d))
        return out

    s_xx = wsum(ix * ix)
    s_yy = wsum(iy * iy)
    s_xy = wsum(ix * iy)
    b0 = -wsum(ix * it)
    b1 = -wsum(iy * it)

    # Cramer solve gated on |det| (the RTL flow_solver's divide + gate,
    # rtl/unopt/flow_solver.sv:112-149, with the golden model's 1e-4
    # threshold, python/lucas_kanade_core.py:131).
    det = s_xx * s_yy - s_xy * s_xy
    solvable = jnp.abs(det) > det_threshold
    inv = jnp.where(solvable, 1.0 / jnp.where(solvable, det, 1.0), 0.0)
    u = (s_yy * b0 - s_xy * b1) * inv
    v = (s_xx * b1 - s_xy * b0) * inv

    # Zero the half-window border (reference: flow only for fully-interior
    # windows, python/lucas_kanade_core.py:104-107) and any grid overhang.
    r0 = (s % n_tiles) * tile_rows
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, width), 0) + r0
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, width), 1)
    interior = (
        (rows >= half)
        & (rows < height - half)
        & (cols >= half)
        & (cols < width - half)
    )
    u_ref[0] = jnp.where(interior, u, 0.0)
    v_ref[0] = jnp.where(interior, v, 0.0)


@functools.partial(
    jax.jit, static_argnames=("window_size", "det_threshold", "tile_rows")
)
def _fused_batched(
    frame_prev: jax.Array,
    frame_curr: jax.Array,
    window_size: int,
    det_threshold: float,
    tile_rows: int | None,
) -> tuple[jax.Array, jax.Array]:
    """(B, H, W) batched fused LK."""
    bsz, h, w = frame_prev.shape
    if tile_rows is None:
        # ~30 live (th, w)-sized f32 planes in VMEM (double-buffered
        # slabs, gradients, products, sums, double-buffered outputs,
        # Mosaic temporaries); keep the working set under ~12 MB.
        budget_rows = (12 * 1024 * 1024) // (30 * 4 * max(w, 128))
        tile_rows = min(128, max(8, (budget_rows // 8) * 8))
    th = min(tile_rows, _round_up(h, 8))
    hp = _round_up(h, th)
    # DMA slabs must be tile-aligned: rows to 8 sublanes (th, APRON do
    # that), lanes to 128 — pad the slab width up to a 128 multiple.
    wp = _round_up(w + 2 * APRON, 128)

    def pad(f):
        f = jnp.pad(f, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
        return jnp.pad(f, ((0, 0), (3, 3 + hp - h), (3, wp - w - 5)))

    prev_p = pad(frame_prev)
    curr_p = pad(frame_curr)

    n_tiles = hp // th
    kernel = functools.partial(
        _lk_kernel,
        n_tiles=n_tiles,
        tile_rows=th,
        height=h,
        width=w,
        window=window_size,
        det_threshold=det_threshold,
    )
    u, v = pl.pallas_call(
        kernel,
        grid=(bsz * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, w),
                lambda s: (s // n_tiles, s % n_tiles, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, w),
                lambda s: (s // n_tiles, s % n_tiles, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, hp, w), frame_prev.dtype),
            jax.ShapeDtypeStruct((bsz, hp, w), frame_prev.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, th + 2 * APRON, wp), frame_prev.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(190 * bsz * h * w),
            bytes_accessed=int(16 * bsz * h * w),
            transcendentals=0,
        ),
    )(prev_p, curr_p)
    if hp != h:
        u = u[:, :h]
        v = v[:, :h]
    return u, v


@functools.lru_cache(maxsize=None)
def _make_fused(window_size: int, det_threshold: float, tile_rows: int | None):
    """custom_vmap wrapper for one static configuration."""

    @jax.custom_batching.custom_vmap
    def fused(prev, curr):
        u, v = _fused_batched(
            prev[None], curr[None], window_size, det_threshold, tile_rows
        )
        return u[0], v[0]

    @fused.def_vmap
    def _vmap_rule(axis_size, in_batched, prev, curr):  # noqa: ANN001
        pb, cb = in_batched
        if not pb:
            prev = jnp.broadcast_to(prev, (axis_size,) + prev.shape)
        if not cb:
            curr = jnp.broadcast_to(curr, (axis_size,) + curr.shape)
        out = _fused_batched(prev, curr, window_size, det_threshold, tile_rows)
        return out, (True, True)

    return fused


def lucas_kanade_fused(
    frame_prev: jax.Array,
    frame_curr: jax.Array,
    window_size: int = 5,
    det_threshold: float = 1e-4,
    tile_rows: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused dense LK flow: (u, v) = kernel(prev, curr).

    Drop-in twin of the jnp path (tpuflow.flow.single_scale with
    backend="jnp") — SURVEY.md §7 step 4. Accepts (H, W) frames or
    (B, H, W) batches; also composes with ``jax.vmap``.
    """
    if window_size // 2 + 1 > APRON:
        # The slab apron covers Sobel (1) + window half; 3/5/7 windows fit.
        raise ValueError("pallas kernel supports window_size <= 7; use backend='jnp'")
    if frame_prev.ndim == 3:
        return _fused_batched(
            frame_prev, frame_curr, window_size, det_threshold, tile_rows
        )
    return _make_fused(window_size, det_threshold, tile_rows)(
        frame_prev, frame_curr
    )
