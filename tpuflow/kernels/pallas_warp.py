"""Banded bilinear warp Pallas TPU kernel.

TPU-native equivalent of the reference's warp stage — the golden model's
``map_coordinates`` backward warp (python/lucas_kanade_pyramidal.py:66-97)
and the RTL ``frame_warper`` (rtl/unopt/frame_warper.sv:21-247, a 7-state
FSM doing 4 BRAM corner reads per pixel). Arbitrary per-pixel 2-D gather
through XLA costs ~95 ms/frame at 1080p on TPU; this kernel restructures
the warp around what the hardware can do:

- **Horizontal**: ``tpu.dynamic_gather`` gathers within a single 128-lane
  vreg. The band is viewed as (rows x blocks, 128) — a layout-preserving
  reshape. Because the fast path bounds |u| <= max_disp, two copies of
  the band lane-shifted by -+(max_disp+1) give every output lane a copy
  whose vreg contains its whole sample range: lanes in the lower half of
  each block gather from the left-shifted copy, upper half from the
  right-shifted one — a STATIC selection, two hardware gathers per
  corner per candidate row. Exact for |u| <= max_disp (max_disp <= 31);
  horizontal samples beyond the band are clamped to the band edge.
- **Vertical**: displacement is bounded by a static band ``max_disp``
  (the analog of the RTL's S8.7 +-8 px flow clamp,
  flow_solver.sv:134-144). Each output row tile DMAs a
  (tile + 2*band)-row slab; candidate source rows are combined with
  equality masks — one hardware gather pair per candidate row.

Within |u|,|v| <= max_disp the result matches the jnp warp to f32
rounding (tests/test_pallas_kernels.py); vertical displacements beyond
the band read 0 (like an out-of-bounds sample) and horizontal ones
saturate at the band edge. Callers needing unbounded parity semantics
use the jnp warp; the fast pyramidal driver clamps flow to the band
first (RTL-clamp semantics).

Natively batched over a flattened (batch * row_tiles) grid with a
``custom_vmap`` rule, so ``vmap`` over frame streams composes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _warp_block(band, u, v, r0, *, n_rows: int, height: int, width: int,
                wp: int, dpad: int, max_disp: int, max_disp_v: int,
                clamp_flow: bool, packed_u8: bool = False,
                packed_u16: bool = False, x1_scr=None):
    """Core banded-warp math on one VMEM band slab.

    ``band``: (n_rows + 2*dpad, wp + 256) slab whose local row d holds
    image row ``r0 + d - dpad`` (columns lane-shifted by 128 each side).
    ``u``/``v``: (n_rows, wp) flow planes for output rows
    ``r0 .. r0+n_rows``. Returns the (n_rows, wp) warped plane
    (OOB -> 0). The row-offset/row-count parameterization (vs the
    kernel wrapper's fixed tile grid) exists so other kernels can embed
    the warp — used by the warp+refine fusion experiment, which was
    measured slower and reverted (docs/DESIGN.md §3 ablation table);
    kept because it also reads cleaner than the fused DMA+math body."""
    th = n_rows
    nb = wp // 128
    band_h = th + 2 * dpad

    if clamp_flow:
        # Per-level RTL-style saturation applied in-kernel (the fused
        # refine driver passes raw carried flow; flow_solver.sv:134-144).
        # The vertical band may be narrower (max_disp_v): the candidate
        # loop below is the frame-time hot spot, and vertical motion per
        # refinement level is usually far below the horizontal budget.
        u = jnp.clip(u, -float(max_disp), float(max_disp))
        v = jnp.clip(v, -float(max_disp_v), float(max_disp_v))
    # Mosaic iota is integer-only; cast to f32 after generation.
    xx_i = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1)
    yy_i = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0) + r0
    xf = xx_i.astype(jnp.float32) + u
    yf = yy_i.astype(jnp.float32) + v
    x0f = jnp.floor(xf)
    y0f = jnp.floor(yf)
    fx = xf - x0f
    fy = yf - y0f

    # Horizontal gather coordinates. The fast-path contract bounds
    # |u| <= max_disp, so x0 for output lane j lies in
    # [j - max_disp - 1, j + max_disp]; clamp defensively so the static
    # copy selection below stays in range even for out-of-contract flow
    # (true OOB is zeroed by the inside mask either way).
    shift = max_disp + 1
    lo = xx_i - shift
    hi = xx_i + max_disp
    x0 = jnp.clip(jnp.clip(x0f.astype(jnp.int32), lo, hi), 0, width - 1)
    x1 = jnp.clip(jnp.clip(x0f.astype(jnp.int32) + 1, lo, hi + 1), 0, width - 1)
    my_block = jax.lax.shift_right_logical(xx_i, 7)

    # Vertical candidate offset: band row d holds image row r0 + d - dpad,
    # so the upper source row sits at local offset floor(v) + dpad.
    dy_local = y0f.astype(jnp.int32) - yy_i + dpad

    def rs(a):  # (th, wp) -> gather space (th*nb, 128); layout-preserving
        return a.reshape(th * nb, 128)

    # Copy A is the band shifted left by `shift` lanes (block b holds
    # image cols [128b - shift, 128b - shift + 128)), copy B shifted
    # right. Lanes j%128 < 64 always fit copy A's vreg, the rest copy B
    # (valid because shift + max_disp + 1 <= 64).
    base = my_block * 128
    idx_a0 = rs(jnp.clip(x0 - base + shift, 0, 127))
    idx_b0 = rs(jnp.clip(x0 - base - shift, 0, 127))
    if not (packed_u8 or packed_u16):
        idx_a1 = rs(jnp.clip(x1 - base + shift, 0, 127))
        idx_b1 = rs(jnp.clip(x1 - base - shift, 0, 127))
    # Gather-space lane mask (lane < 64 <=> original col % 128 < 64).
    # Generated directly in gather space: Mosaic cannot reshape an i1
    # vector, and widening to f32 for arithmetic masking costs 3 VPU ops
    # per combine where a select costs 1.
    lower_b = (
        jax.lax.broadcasted_iota(jnp.int32, (th * nb, 128), 1) < 64
    )
    fx_r = rs(fx)
    fxc_r = 1.0 - fx_r
    # Vertical weights in gather space: candidate dy contributes the
    # (1-fy) share where it is the upper source row (dy_r == dy) and the
    # fy share where it is the lower one (dy_r == dy - 1).
    fy_r = rs(fy)
    fyc_r = 1.0 - fy_r
    dy_r = rs(dy_local)

    if packed_u8:
        # Packed-u8 fast path: the image is integer-valued in [0, 255]
        # (an 8-bit source — the finest pyramid level IS the raw frame),
        # so all four bilinear corners of a candidate-row PAIR — rows
        # (r, r+1) x columns (x0, x0+1) — fit exactly in one i32 word.
        # One 32-bit hardware gather then replaces the exact path's four
        # (two corners x two band copies... see loop below): the gather
        # count per candidate row drops 4x, and the kernel is
        # gather-issue-bound (~3 cycles/vreg-gather, DESIGN.md §3), so
        # this attacks the measured hot cost directly. Unpacking is
        # straight-line VPU shifts/masks. Bit-identical to the exact
        # path for in-band flow on integer-valued images: the unpacked
        # corners are exact integers and the f32 lerp expressions are
        # unchanged. dynamic_gather requires index/result bitwidths to
        # match (bf16 gathers are unreachable), which is exactly why the
        # packing target is i32.
        # Mosaic hazard (measured on real v5e, fine in interpret mode):
        # int-converting a lane-misaligned view — `convert(slice(x,
        # lane_offset=1))` in either order — reads 0 in lanes j%8 in
        # 2..7. The by-1-lane-shifted corner view is therefore
        # MATERIALIZED through a VMEM scratch roundtrip first (verified
        # correct), so every convert below sees a plainly-laid-out
        # operand. An r4 attempt to drop the scratch by lane-shifting
        # the already-converted integers instead — the trick that IS
        # device-clean for the u16 path's single (x<<16)|shift(x)
        # construction — FAILED device bit-identity for this 4-term
        # shift/or chain (fastpath stage 7 caught it; reverted same
        # session). The miscompile class is pattern-dependent: do not
        # touch this packing without the on-device identity check.
        # Mosaic also has no direct f32<->u32 cast, hence the i32 hop
        # (values are 0..255, so the bit patterns agree).
        wb = wp + 256
        assert x1_scr is not None, "packed_u8 needs the x1 scratch buffer"
        x1_scr[...] = jax.lax.slice(band, (0, 1), (band_h, wb))

        def u32c(a):
            return a.astype(jnp.int32).astype(jnp.uint32)

        bu = u32c(band)
        su = u32c(x1_scr[...])
        p = (
            (jax.lax.slice(bu, (0, 0), (band_h - 1, wb - 1)) << jnp.uint32(24))
            | (jax.lax.slice(su, (0, 0), (band_h - 1, wb - 1)) << jnp.uint32(16))
            | (jax.lax.slice(bu, (1, 0), (band_h, wb - 1)) << jnp.uint32(8))
            | jax.lax.slice(su, (1, 0), (band_h, wb - 1))
        )
        packed_a = jax.lax.slice(
            p, (0, 128 - shift), (band_h - 1, 128 - shift + wp)
        ).reshape((band_h - 1) * nb, 128)
        packed_b = jax.lax.slice(
            p, (0, 128 + shift), (band_h - 1, 128 + shift + wp)
        ).reshape((band_h - 1) * nb, 128)

        # Paired candidate loop: packed row d carries candidates d (high
        # half) and d+1 (low half); the select logic is the exact loop's,
        # applied to both candidates of the pair (masks are disjoint, so
        # application order within the pair is value-irrelevant).
        up_plane = jnp.zeros((th * nb, 128), jnp.float32)
        low_plane = jnp.zeros((th * nb, 128), jnp.float32)
        m_prev = None
        for d in range(dpad - max_disp_v, dpad + max_disp_v + 1, 2):
            rows_a = jax.lax.slice(
                packed_a, (d * nb, 0), ((d + th) * nb, 128)
            )
            rows_b = jax.lax.slice(
                packed_b, (d * nb, 0), ((d + th) * nb, 128)
            )
            w32 = jnp.where(
                lower_b,
                jnp.take_along_axis(
                    rows_a, idx_a0, axis=1, mode="promise_in_bounds"
                ),
                jnp.take_along_axis(
                    rows_b, idx_b0, axis=1, mode="promise_in_bounds"
                ),
            )
            def byte(shift_bits: int) -> jax.Array:
                b8 = (w32 >> jnp.uint32(shift_bits)) & jnp.uint32(0xFF)
                return b8.astype(jnp.int32).astype(jnp.float32)

            c00 = byte(24)
            c01 = byte(16)
            c10 = byte(8)
            c11 = byte(0)
            h0 = c00 * fxc_r + c01 * fx_r
            h1 = c10 * fxc_r + c11 * fx_r
            m0 = dy_r == d
            m1 = dy_r == (d + 1)
            up_plane = jnp.where(m0, h0, up_plane)
            up_plane = jnp.where(m1, h1, up_plane)
            if m_prev is not None:
                low_plane = jnp.where(m_prev, h0, low_plane)
            low_plane = jnp.where(m0, h1, low_plane)
            m_prev = m1

        out = (up_plane * fyc_r + low_plane * fy_r).reshape(th, wp)
        inside = (
            (xf >= 0.0)
            & (xf <= float(width - 1))
            & (yf >= 0.0)
            & (yf <= float(height - 1))
        )
        return jnp.where(inside, out, 0.0)

    if packed_u16:
        # Packed-u16 path (round-4): TWO horizontal corners per i32
        # gather — (x0, x0+1) of one candidate row as 16-bit fixed-point
        # values (8.8: value*256, rounded; step 1/256 ~= 0.004 gray).
        # Unlike packed_u8 (which needs integer-valued frames and costs
        # half-gray rounding on anything else — rejected for the
        # blurred coarse pyramid levels at +23-33% MAE), 8.8 quantization
        # is far below the levels' gradient scale, so this extends the
        # packed-gather speedup to the COARSE levels: the candidate loop
        # runs 2 hardware gathers per candidate row instead of the exact
        # path's 4 on a gather-issue-bound kernel (DESIGN.md §3).
        # Accuracy is gated through the committed 10% suite like every
        # fast-path variant. Same Mosaic hazard handling as packed_u8:
        # the by-1-lane-shifted corner view is materialized through a
        # VMEM scratch before the f32->i32 convert.
        wb = wp + 256

        def q16(a):
            # Round-to-nearest 8.8 fixed point. No range clip: the
            # contract bounds values to [0, 255] (pyramid levels are
            # convex combinations of u8 samples, so this holds by
            # construction, not just by convention) and 255*256+0.5
            # rounds to 65280 < 2^16 — out-of-contract inputs are the
            # caller's documented responsibility here exactly as in the
            # packed_u8 path. Convert the FULL plainly-laid-out array
            # and slice the integer result afterwards — the structure
            # the u8 path uses; converting slices instead was measured
            # to blow Mosaic compile time up (>30 min at 1080p).
            return (a * 256.0 + 0.5).astype(jnp.int32).astype(jnp.uint32)

        # ONE quantization pass; the x1 corner is the same integer
        # array lane-shifted by 1. The Mosaic misaligned-convert hazard
        # does not apply: the by-1-lane slice happens AFTER the convert
        # on plain integer data (device-validated vs the exact kernel —
        # the broken pattern is converting the misaligned VIEW).
        bu = q16(band)
        p = (
            (jax.lax.slice(bu, (0, 0), (band_h, wb - 1)) << jnp.uint32(16))
            | jax.lax.slice(bu, (0, 1), (band_h, wb))
        )
        packed_a = jax.lax.slice(
            p, (0, 128 - shift), (band_h, 128 - shift + wp)
        ).reshape(band_h * nb, 128)
        packed_b = jax.lax.slice(
            p, (0, 128 + shift), (band_h, 128 + shift + wp)
        ).reshape(band_h * nb, 128)

        up_plane = jnp.zeros((th * nb, 128), jnp.float32)
        low_plane = jnp.zeros((th * nb, 128), jnp.float32)
        m_prev = None
        for dy in range(dpad - max_disp_v, dpad + max_disp_v + 2):
            rows_a = jax.lax.slice(
                packed_a, (dy * nb, 0), ((dy + th) * nb, 128)
            )
            rows_b = jax.lax.slice(
                packed_b, (dy * nb, 0), ((dy + th) * nb, 128)
            )
            w32 = jnp.where(
                lower_b,
                jnp.take_along_axis(
                    rows_a, idx_a0, axis=1, mode="promise_in_bounds"
                ),
                jnp.take_along_axis(
                    rows_b, idx_b0, axis=1, mode="promise_in_bounds"
                ),
            )
            c0 = (w32 >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
            c1 = (
                (w32 & jnp.uint32(0xFFFF)).astype(jnp.int32)
                .astype(jnp.float32)
            )
            h = c0 * fxc_r + c1 * fx_r
            m = dy_r == dy
            up_plane = jnp.where(m, h, up_plane)
            if m_prev is not None:
                low_plane = jnp.where(m_prev, h, low_plane)
            m_prev = m

        # The 8.8 scale folds into the final vertical lerp (one multiply
        # per output instead of two per corner).
        out = (
            (up_plane * fyc_r + low_plane * fy_r) * (1.0 / 256.0)
        ).reshape(th, wp)
        inside = (
            (xf >= 0.0)
            & (xf <= float(width - 1))
            & (yf >= 0.0)
            & (yf <= float(height - 1))
        )
        return jnp.where(inside, out, 0.0)

    band_a = jax.lax.slice(
        band, (0, 128 - shift), (band_h, 128 - shift + wp)
    ).reshape(band_h * nb, 128)
    band_b = jax.lax.slice(
        band, (0, 128 + shift), (band_h, 128 + shift + wp)
    ).reshape(band_h * nb, 128)

    # Candidate-row loop (the frame-time hot spot). Each output pixel
    # takes exactly ONE candidate as its upper bilinear row (dy_r == dy)
    # and one as its lower (dy_r == dy - 1), so instead of a weighted
    # accumulate (2 cmp + 2 sel + mul + add per dy) the loop *selects*
    # into an upper and a lower plane (1 cmp + 2 sel per dy, reusing the
    # previous iteration's mask for the lower plane) and the vertical
    # lerp happens once after the loop. Bit-identical to the weighted
    # form for in-band flow: the same two h values combine in the same
    # order, and the dropped terms were exact zeros. (Pixels with v just
    # below the band, which the weighted form gave a partial fy-only
    # sample, now read 0 — the documented beyond-band contract.)
    # Measured at 1080p: 0.751 ms vs 0.754 ms for the weighted form —
    # the VPU ops saved were fully hidden under the gather issue rate,
    # confirming the kernel is gather-bound at ~4 hardware gathers per
    # candidate row (see docs/DESIGN.md ceiling analysis).
    up_plane = jnp.zeros((th * nb, 128), jnp.float32)
    low_plane = jnp.zeros((th * nb, 128), jnp.float32)
    m_prev = None
    for dy in range(dpad - max_disp_v, dpad + max_disp_v + 2):
        rows_a = jax.lax.slice(band_a, (dy * nb, 0), ((dy + th) * nb, 128))
        rows_b = jax.lax.slice(band_b, (dy * nb, 0), ((dy + th) * nb, 128))
        g0 = jnp.where(
            lower_b,
            jnp.take_along_axis(
                rows_a, idx_a0, axis=1, mode="promise_in_bounds"
            ),
            jnp.take_along_axis(
                rows_b, idx_b0, axis=1, mode="promise_in_bounds"
            ),
        )
        g1 = jnp.where(
            lower_b,
            jnp.take_along_axis(
                rows_a, idx_a1, axis=1, mode="promise_in_bounds"
            ),
            jnp.take_along_axis(
                rows_b, idx_b1, axis=1, mode="promise_in_bounds"
            ),
        )
        h = g0 * fxc_r + g1 * fx_r
        m = dy_r == dy
        up_plane = jnp.where(m, h, up_plane)
        if m_prev is not None:
            low_plane = jnp.where(m_prev, h, low_plane)
        m_prev = m

    out = (up_plane * fyc_r + low_plane * fy_r).reshape(th, wp)
    inside = (
        (xf >= 0.0)
        & (xf <= float(width - 1))
        & (yf >= 0.0)
        & (yf <= float(height - 1))
    )
    return jnp.where(inside, out, 0.0)


def _warp_kernel(img_hbm, u_ref, v_ref, out_ref, band_sl, sem, *extra_scr,
                 n_tiles: int, tile_rows: int, height: int, width: int,
                 wp: int, dpad: int, max_disp: int, max_disp_v: int,
                 clamp_flow: bool, packed_u8: bool, packed_u16: bool):
    th = tile_rows
    s = pl.program_id(0)
    b = s // n_tiles
    i = s % n_tiles
    r0 = i * th
    band_h = th + 2 * dpad

    cp = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(r0, band_h), :], band_sl, sem
    )
    cp.start()
    cp.wait()

    out = _warp_block(
        band_sl[:], u_ref[0], v_ref[0], r0, n_rows=th, height=height,
        width=width, wp=wp, dpad=dpad, max_disp=max_disp,
        max_disp_v=max_disp_v, clamp_flow=clamp_flow, packed_u8=packed_u8,
        packed_u16=packed_u16,
        x1_scr=extra_scr[0] if extra_scr else None,
    )
    out_ref[0] = jax.lax.slice(out, (0, 0), (th, width))


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_disp", "tile_rows", "clamp_flow", "max_disp_v", "packed_u8",
        "packed_u16",
    ),
)
def _warp_batched(
    image: jax.Array,
    flow_u: jax.Array,
    flow_v: jax.Array,
    max_disp: int,
    tile_rows: int | None,
    clamp_flow: bool = False,
    max_disp_v: int | None = None,
    packed_u8: bool = False,
    packed_u16: bool = False,
) -> jax.Array:
    """(B, H, W) batched banded warp."""
    if max_disp_v is None:
        max_disp_v = max_disp
    bsz, h, w = image.shape
    if tile_rows is None:
        # Live-plane budgets by variant (r5 device sweep,
        # scripts/r5_warp_tile_sweep.py + DESIGN §3): the packed kernels
        # hold fewer full-width temporaries than the exact path's ~60
        # (one packed word per corner pair replaces four corner planes),
        # so they afford much taller tiles — and taller tiles amortize
        # the per-tile index/fraction prelude and cut the DMA slab's
        # (tile + 2*dpad)/tile re-read factor. Measured at 4K (width
        # 3840, where the old uniform budget degenerated to 8-row
        # tiles): packed_u8 1.53 -> 1.11 ms at 32 rows, packed_u16 2.13
        # -> 1.80 ms at 24; 48/32 rows respectively OOM the 16 MB
        # scoped VMEM, hence the plane counts below. At 1080p the same
        # budgets land on 32-row tiles (u8 0.31 -> 0.27 ms, u16 ~flat,
        # both re-measured twice per the tunnel-jitter rule). The exact
        # kernel keeps the old budget (it OOMs above 24 rows at 1080p).
        if packed_u8:
            planes, cap = 24, 32
        elif packed_u16:
            planes, cap = 34, 32
        else:
            planes, cap = 60, 64
        budget_rows = (12 * 1024 * 1024) // (planes * 4 * max(w, 128))
        if not (packed_u8 or packed_u16):
            budget_rows = (8 * 1024 * 1024) // (planes * 4 * max(w, 128))
        tile_rows = min(cap, max(8, (budget_rows // 8) * 8))
    th = min(tile_rows, _round_up(h, 8))
    hp = _round_up(h, th)
    wp = _round_up(w, 128)
    # Vertical band apron sized by the *vertical* budget only: the DMA
    # slab is (tile + 2*dpad) rows and the candidate loop runs
    # 2*max_disp_v + 2 gather pairs, so a narrow vertical band shrinks
    # both the slab traffic and the hot loop.
    dpad = _round_up(max_disp_v + 1, 4)

    # Rows: vertical band apron + grid overhang. Cols: one 128-lane block
    # margin each side for the shifted gather copies.
    img_p = jnp.pad(image, ((0, 0), (dpad, dpad + hp - h), (128, 128 + wp - w)))
    u_p = jnp.pad(flow_u, ((0, 0), (0, hp - h), (0, wp - w)))
    v_p = jnp.pad(flow_v, ((0, 0), (0, hp - h), (0, wp - w)))

    n_tiles = hp // th
    kernel = functools.partial(
        _warp_kernel,
        n_tiles=n_tiles,
        tile_rows=th,
        height=h,
        width=w,
        wp=wp,
        dpad=dpad,
        max_disp=max_disp,
        max_disp_v=max_disp_v,
        clamp_flow=clamp_flow,
        packed_u8=packed_u8,
        packed_u16=packed_u16,
    )
    flow_spec = pl.BlockSpec(
        (1, th, wp), lambda s: (s // n_tiles, s % n_tiles, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            flow_spec,
            pl.BlockSpec(
                (1, th, wp), lambda s: (s // n_tiles, s % n_tiles, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda s: (s // n_tiles, s % n_tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w), image.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * dpad, wp + 256), image.dtype),
            pltpu.SemaphoreType.DMA(()),
        ] + (
            # Materialization buffer for the by-1-lane-shifted corner
            # view (see _warp_block's Mosaic-hazard note). packed_u16
            # needs no scratch: its single-term lane shift on converted
            # integers is device-clean (unlike u8's 4-term chain).
            [pltpu.VMEM((th + 2 * dpad, wp + 255), image.dtype)]
            if packed_u8 else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=int((2 * max_disp_v + 2) * 16 * bsz * h * w),
            bytes_accessed=int(16 * bsz * h * w),
            transcendentals=0,
        ),
    )(img_p, u_p, v_p)
    return out[:, :h] if hp != h else out


@functools.lru_cache(maxsize=None)
def _make_warp(
    max_disp: int,
    tile_rows: int | None,
    clamp_flow: bool,
    max_disp_v: int | None,
    packed_u8: bool,
    packed_u16: bool,
):
    @jax.custom_batching.custom_vmap
    def warp(image, flow_u, flow_v):
        return _warp_batched(
            image[None], flow_u[None], flow_v[None], max_disp, tile_rows,
            clamp_flow, max_disp_v, packed_u8, packed_u16,
        )[0]

    @warp.def_vmap
    def _vmap_rule(axis_size, in_batched, image, flow_u, flow_v):  # noqa: ANN001
        args = []
        for a, batched in zip((image, flow_u, flow_v), in_batched):
            if not batched:
                a = jnp.broadcast_to(a, (axis_size,) + a.shape)
            args.append(a)
        return (
            _warp_batched(
                *args, max_disp, tile_rows, clamp_flow, max_disp_v,
                packed_u8, packed_u16,
            ),
            True,
        )

    return warp


def warp_image_banded(
    image: jax.Array,
    flow_u: jax.Array,
    flow_v: jax.Array,
    max_disp: int = 8,
    tile_rows: int | None = None,
    clamp_flow: bool = False,
    max_disp_v: int | None = None,
    packed_u8: bool = False,
    packed_u16: bool = False,
) -> jax.Array:
    """Backward bilinear warp, out(x,y) = image(x+u, y+v), OOB -> 0.

    Exact for |u| <= ``max_disp`` and |v| <= ``max_disp_v`` (both <= 31;
    ``max_disp_v`` defaults to ``max_disp``); vertical displacements
    beyond the band read 0, horizontal ones saturate at the band edge.
    Both bands are static; the default mirrors the reference RTL's
    +-8 px flow clamp (flow_solver.sv:134-144). A narrower vertical band
    shrinks the kernel's candidate-row gather loop (the frame-time hot
    spot) roughly linearly. Accepts (H, W) or (B, H, W); composes with
    ``jax.vmap``.
    """
    assert max_disp <= 31, "banded warp supports max_disp <= 31"
    assert max_disp_v is None or max_disp_v <= 31
    # packed_u8 (4x fewer hardware gathers in the candidate loop, see
    # _warp_block) is exact ONLY for images whose values are integers in
    # [0, 255] — 8-bit sources, e.g. the finest pyramid level. packed_u16
    # (2x fewer gathers) quantizes values in [0, 255] to 8.8 fixed point
    # (step 1/256) and suits the blurred float pyramid levels. Both
    # assume the in-band flow contract, so require the in-kernel clamp.
    assert not (packed_u8 and packed_u16), "pick one packing"
    assert not (packed_u8 or packed_u16) or clamp_flow, (
        "packed gathers require clamp_flow"
    )
    if image.ndim == 3:
        return _warp_batched(
            image, flow_u, flow_v, max_disp, tile_rows, clamp_flow,
            max_disp_v, packed_u8, packed_u16,
        )
    return _make_warp(
        max_disp, tile_rows, clamp_flow, max_disp_v, packed_u8, packed_u16
    )(image, flow_u, flow_v)
