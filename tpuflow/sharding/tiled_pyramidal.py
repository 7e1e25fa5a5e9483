"""Multi-chip tiled pyramidal Lucas-Kanade flow.

Level-dependent sharding strategy (SURVEY.md §7 step 6 / §5
"halo correctness across pyramid levels"), round 5: the pyramid BUILD
is distributed.

- **Every level whose tile is big enough is sharded end-to-end.** The
  pyramid downsample and the flow upsampler are banded per-axis
  operators, so each device computes its tile of every level from its
  own rows plus a ~10-px halo exchanged over ICI
  (``tpuflow.sharding.dist_pyramid``) — no full-frame ``all_gather``.
  At 1080p on a (2, 2) or (2, 4) mesh and at 4K up to (4, 4), every
  level shards: per-frame communication is halo strips only, the term
  that kept the r4 scaling model's tiled axis at 0.54 efficiency @ 4
  chips (all_gather of both frames) is gone. Reference analog: each RTL
  pyramid_builder consumes its own stream without a global gather
  (/root/reference/rtl/unopt/pyramid_builder.sv:22-404).
- **Levels with too-small tiles stay replicated.** A level is sharded
  only if its dims divide the mesh and its tile exceeds twice the warp
  halo (coarse 80x60-class levels fail this); the coarsest sharded
  level is all_gathered ONCE (that level's pixels, not the full frame)
  and the remaining coarse levels build + solve replicated —
  deterministic, so every device holds identical coarse flow. When only
  the finest level shards (tiny test frames), this degenerates to the
  r4 design: the gathered "level" is the raw frame.
- **Sharded refinement** per level: the current-frame tile is
  halo-extended by ``max_disp + 1`` rows/cols (RTL-clamp-bounded warp
  reads, flow_solver.sv:134-144 analog) for the warp, then by the
  3-pixel Sobel+window apron for the residual LK solve; convergence
  tests psum the global |residual| means.

Semantics: matches the single-device fast path
(``lucas_kanade_pyramidal(..., rtl_clamp=True)``) — exactly when only
the finest level shards, and to f32 rounding of the banded per-device
operator contractions (~1 ulp on level images; see
``dist_pyramid.sharded_downsample``) when coarse levels shard too.
Verified in tests/test_sharding.py. The adaptive vertical-band ladder
(``PyramidConfig.adaptive_v_bands``) is NOT applied on the tiled path —
it runs the static ``max_disp_v_effective`` band at every level (the
ladder's global interior-|v| statistics would need an extra psum per
level boundary; a latency lever, not a semantics gap).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuflow.core import ops
from tpuflow.core.config import PyramidConfig
from tpuflow.kernels import jnp_ref
from tpuflow.sharding import dist_pyramid
from tpuflow.sharding import halo as halo_mod
from tpuflow.sharding.tiled_flow import HALO, _local_lk


def _interpret_ctx(interpret: bool):
    """Pallas interpret-mode context for the CPU-mesh composition.

    Placement matters, empirically (8 virtual CPU devices, jax 0.8):
    entering ``force_tpu_interpret_mode`` INSIDE the shard-mapped code,
    immediately around the kernel calls, runs fine; wrapping the whole
    jit/device_put/dispatch from OUTSIDE deadlocks the interpreter's
    global device barrier at >=8 devices (threads stuck in
    interpret_pallas_call._allocate_buffer). Scripts/tests should pass
    ``interpret=True`` here rather than wrapping the call site.
    """
    if interpret:
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()


def _level_shapes(
    gh: int, gw: int, levels: int, scale_factor: float
) -> list[tuple[int, int]]:
    """Global (h, w) per level, coarse -> fine — the same dims
    ``jnp_ref.build_gaussian_pyramid`` produces."""
    dims = [(gh, gw)]
    h, w = gh, gw
    for _ in range(levels - 1):
        h, w = int(h * scale_factor), int(w * scale_factor)
        dims.append((h, w))
    dims.reverse()
    return dims


def _shard_plan(
    dims: list[tuple[int, int]], ty: int, tx: int, warp_halo: int
) -> list[bool]:
    """Which levels run sharded (static): a level shards iff its dims
    divide the mesh, its tile exceeds twice the warp halo, and every
    FINER level shards too (the build walks fine -> coarse; once a
    level gathers, coarser levels stay replicated)."""
    sharded = [False] * len(dims)
    ok = True
    for lvl in range(len(dims) - 1, -1, -1):
        h, w = dims[lvl]
        good = (
            h % ty == 0
            and w % tx == 0
            and h // ty > 2 * warp_halo
            and w // tx > 2 * warp_halo
        )
        ok = ok and good
        sharded[lvl] = ok
    return sharded


def _warp_tile(img_ext, u, v, halo, gy0, gx0, gh, gw):
    """Backward warp of a halo-extended tile with local flow.

    img_ext: (h + 2*halo, w + 2*halo); |u|,|v| <= halo - 1 guaranteed by
    the caller's clamp. Bilinear with the golden model's hard-OOB
    semantics at true image borders.
    """
    h, w = u.shape
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    val = ops.map_coordinates_bilinear(
        img_ext, yy + v + halo, xx + u + halo, cval=0.0
    )
    # Global OOB -> 0 (the extended tile's zero fill already covers the
    # values; this mask reproduces the exact boundary blend cut-off).
    gy = yy + gy0 + v
    gx = xx + gx0 + u
    inside = (gy >= 0) & (gy <= gh - 1) & (gx >= 0) & (gx <= gw - 1)
    return jnp.where(inside, val, 0.0)


def _warp_tile_pallas(curr_ext, u, v, halo, gy0, gx0, gh, gw, max_disp,
                      max_disp_v=None, packed_u8=False, packed_u16=False,
                      interpret=False):
    """Banded Pallas warp of a halo-extended tile (the fast-path twin of
    :func:`_warp_tile`): flow is zero-padded out to the extended shape,
    the hardware-gather kernel warps the whole extended tile (its local
    OOB mask never fires for center pixels — |flow| <= max_disp < halo),
    and the center crop gets the exact global-border zero cut-off.

    ``packed_u8`` (PyramidConfig.warp_packed_u8): the finest-level tile
    is raw-frame data (integer-valued for 8-bit sources; halo/zero
    padding stays integer), so the packed corner-pair gather kernel is
    bit-identical here like in the single-device driver. ``packed_u16``
    (PyramidConfig.warp_packed_u16): the 8.8 fixed-point corner-pair
    kernel the single-device fast path runs on the blurred COARSE
    levels — plumbed here so a sharded coarse level uses the same
    kernel as its single-device twin (r4 advisor finding). The caller
    pre-clips flow to the band, so the in-kernel clamp the packed paths
    require is a no-op re-clip."""
    from tpuflow.kernels import pallas_warp

    h, w = u.shape
    u_e = jnp.pad(u, halo)
    v_e = jnp.pad(v, halo)
    with _interpret_ctx(interpret):
        out_ext = pallas_warp.warp_image_banded(
            curr_ext, u_e, v_e, max_disp=max_disp, max_disp_v=max_disp_v,
            clamp_flow=packed_u8 or packed_u16,
            packed_u8=packed_u8, packed_u16=packed_u16,
        )
    val = lax.dynamic_slice(out_ext, (halo, halo), (h, w))
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = yy + gy0 + v
    gx = xx + gx0 + u
    inside = (gy >= 0) & (gy <= gh - 1) & (gx >= 0) & (gx <= gw - 1)
    return jnp.where(inside, val, 0.0)


def _local_lk_pallas(prev_t, warped, gy0, gx0, gh, gw, ty, tx,
                     window, det_threshold, interpret=False):
    """Per-shard fused-Pallas residual LK (fast-path twin of
    :func:`tpuflow.sharding.tiled_flow._local_lk`).

    The 3-px Sobel+window apron travels by halo exchange of the raw
    prev/warped tiles (symm boundary == the kernel's own global symm
    pad for the one ring that matters); the kernel then treats the
    extended tile as a standalone image — its symm/interior handling of
    the OUTER ring only affects outputs inside the cropped-away halo.
    The global half-window border zeroing is reapplied by mask."""
    from tpuflow.kernels import pallas_lk

    half = window // 2
    ext = half + 1  # Sobel reach beyond the window ring
    h, w = prev_t.shape
    prev_ext = halo_mod.exchange_halo_2d(
        prev_t, ext, ty=ty, tx=tx, boundary="symm"
    )
    warped_ext = halo_mod.exchange_halo_2d(
        warped, ext, ty=ty, tx=tx, boundary="symm"
    )
    with _interpret_ctx(interpret):
        du_e, dv_e = pallas_lk.lucas_kanade_fused(
            prev_ext, warped_ext, window_size=window,
            det_threshold=det_threshold,
        )
    du = lax.dynamic_slice(du_e, (ext, ext), (h, w))
    dv = lax.dynamic_slice(dv_e, (ext, ext), (h, w))
    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0) + gy0
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1) + gx0
    interior = (
        (rows >= half) & (rows < gh - half)
        & (cols >= half) & (cols < gw - half)
    )
    return jnp.where(interior, du, 0.0), jnp.where(interior, dv, 0.0)


def tiled_lucas_kanade_pyramidal(
    frame_prev: jax.Array,
    frame_curr: jax.Array,
    mesh: Mesh,
    config: PyramidConfig | None = None,
    backend: str = "jnp",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Pyramidal flow over ("batch", "ty", "tx")-sharded (B, H, W) frames.

    Matches ``lucas_kanade_pyramidal(..., rtl_clamp=True)`` (see the
    module docstring for the exactness statement) with ``backend="jnp"``;
    ``backend="pallas"`` swaps the per-shard warp and LK solves for the
    fused TPU kernels (same fast-path numerics as the single-device
    pallas backend, including the packed-u8 finest / packed-u16 coarse
    warp selection).

    ``interpret=True`` runs the pallas kernels in TPU interpret mode —
    the CPU-virtual-mesh validation path (tests/conftest's 8-device
    mesh, __graft_entry__.dryrun_multichip). See :func:`_interpret_ctx`
    for why the context must live here and not at the call site.
    """
    cfg = config or PyramidConfig()
    ty = mesh.shape["ty"]
    tx = mesh.shape["tx"]
    _, gh, gw = frame_prev.shape
    assert gh % ty == 0 and gw % tx == 0
    warp_halo = cfg.max_disp + 1
    sigma = 1.0 / cfg.scale_factor
    dims = _level_shapes(gh, gw, cfg.levels, cfg.scale_factor)
    sharded = _shard_plan(dims, ty, tx, warp_halo)
    assert sharded[-1], (
        f"finest-level tiles ({gh // ty}x{gw // tx}) must exceed twice "
        f"the warp halo ({2 * warp_halo})"
    )
    n_levels = cfg.levels
    # Coarsest sharded level (always exists: the finest shards).
    first_sharded = sharded.index(True)

    spec = P("batch", "ty", "tx")

    def refine_sharded(prev_t, curr_t, u, v, lvl):
        """Sharded refinement iterations on local tiles of level lvl."""
        lh, lw = dims[lvl]
        th, tw = lh // ty, lw // tx
        gy0 = lax.axis_index("ty") * th
        gx0 = lax.axis_index("tx") * tw
        finest = lvl == n_levels - 1
        use_u8 = cfg.warp_packed_u8 and finest and backend == "pallas"
        use_u16 = (
            cfg.warp_packed_u16 and not use_u8 and backend == "pallas"
        )

        def cond(state):
            _, _, i, converged = state
            return jnp.logical_and(i < cfg.iterations, ~converged)

        def body(state):
            u, v, i, converged = state
            u = jnp.clip(u, -cfg.max_disp, cfg.max_disp)
            # Vertical band may be narrower (PyramidConfig.max_disp_v):
            # same clip as the single-device path so tiled == single.
            v = jnp.clip(
                v, -cfg.max_disp_v_effective, cfg.max_disp_v_effective
            )
            curr_ext = halo_mod.exchange_halo_2d(
                curr_t, warp_halo, ty=ty, tx=tx, boundary="zero"
            )
            if backend == "pallas":
                warped = _warp_tile_pallas(
                    curr_ext, u, v, warp_halo, gy0, gx0, lh, lw,
                    cfg.max_disp, cfg.max_disp_v_effective,
                    packed_u8=use_u8, packed_u16=use_u16,
                    interpret=interpret,
                )
                du, dv = _local_lk_pallas(
                    prev_t, warped, gy0, gx0, lh, lw, ty, tx,
                    cfg.window_size, cfg.det_threshold,
                    interpret=interpret,
                )
            else:
                warped = _warp_tile(
                    curr_ext, u, v, warp_halo, gy0, gx0, lh, lw
                )
                avg_ext = halo_mod.exchange_halo_2d(
                    (prev_t + warped) * 0.5, HALO, ty=ty, tx=tx,
                    boundary="symm",
                )
                it_ext = halo_mod.exchange_halo_2d(
                    prev_t - warped, HALO - 1, ty=ty, tx=tx, boundary="zero"
                )
                du, dv = _local_lk(
                    avg_ext, it_ext, gy0, gx0, lh, lw,
                    cfg.window_size, cfg.det_threshold,
                )
            u2 = jnp.where(converged, u, u + du)
            v2 = jnp.where(converged, v, v + dv)
            # Global means over all tiles (psum across the spatial axes).
            sums = lax.psum(
                jnp.stack([jnp.abs(du).sum(), jnp.abs(dv).sum()]),
                ("ty", "tx"),
            )
            npix = float(lh * lw)
            now = jnp.logical_and(
                sums[0] / npix < cfg.convergence_threshold,
                sums[1] / npix < cfg.convergence_threshold,
            )
            return u2, v2, i + 1, converged | now

        # Tie the carry's device-varying annotation to the tile data (the
        # body's halo exchange/psum makes outputs varying; the init must
        # match).
        tie = prev_t[0, 0] * 0.0
        init = (
            u + tie,
            v + tie,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False) | (tie > 1.0),
        )
        u, v, _, _ = lax.while_loop(cond, body, init)
        return u, v

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        # pallas_call outputs carry no vma annotation inside shard_map;
        # correctness vs the single-device path is asserted numerically
        # in tests/test_sharding.py instead.
        check_vma=False,
    )
    def step(prev_l, curr_l):
        def one(prev_t, curr_t):
            # The interpret context wraps the whole per-shard program so
            # the REPLICATED-level pallas calls (_refine_level below runs
            # the single-device fast path on the gathered coarse levels)
            # are interpreted too, not just the sharded refine.
            with _interpret_ctx(interpret):
                return _one_impl(prev_t, curr_t)

        def _one_impl(prev_t, curr_t):
            # --- Distributed pyramid build (fine -> coarse) ---------
            # Local tiles for every sharded level; full (replicated)
            # arrays for the rest, built from ONE gather of the
            # coarsest sharded level.
            tiles_prev = {n_levels - 1: prev_t}
            tiles_curr = {n_levels - 1: curr_t}
            for lvl in range(n_levels - 1, first_sharded, -1):
                tiles_prev[lvl - 1] = dist_pyramid.sharded_downsample(
                    tiles_prev[lvl], dims[lvl], dims[lvl - 1], sigma,
                    ty=ty, tx=tx,
                )
                tiles_curr[lvl - 1] = dist_pyramid.sharded_downsample(
                    tiles_curr[lvl], dims[lvl], dims[lvl - 1], sigma,
                    ty=ty, tx=tx,
                )
            full_prev: dict[int, jax.Array] = {}
            full_curr: dict[int, jax.Array] = {}
            if first_sharded > 0:
                def gather(t):
                    t = lax.all_gather(t, "tx", axis=1, tiled=True)
                    return lax.all_gather(t, "ty", axis=0, tiled=True)

                full_prev[first_sharded] = gather(tiles_prev[first_sharded])
                full_curr[first_sharded] = gather(tiles_curr[first_sharded])
                for lvl in range(first_sharded, 0, -1):
                    nh, nw = dims[lvl - 1]
                    full_prev[lvl - 1] = ops.downsample_fused(
                        full_prev[lvl], nh, nw, sigma
                    )
                    full_curr[lvl - 1] = ops.downsample_fused(
                        full_curr[lvl], nh, nw, sigma
                    )

            # --- Coarse-to-fine solve -------------------------------
            from tpuflow.flow.pyramidal import _refine_level

            u = v = None  # replicated flow (full arrays)
            u_t = v_t = None  # sharded flow (local tiles)
            for lvl in range(n_levels):
                if not sharded[lvl]:
                    # Replicated level: identical solve on every device.
                    lh, lw = dims[lvl]
                    if lvl == 0:
                        u = jnp.zeros((lh, lw), jnp.float32)
                        v = jnp.zeros((lh, lw), jnp.float32)
                    else:
                        u, v = jnp_ref.upsample_flow(u, v, (lh, lw))
                    u, v = _refine_level(
                        full_prev[lvl], full_curr[lvl], u, v, cfg,
                        backend, rtl_clamp=True,
                    )
                    continue
                lh, lw = dims[lvl]
                th, tw = lh // ty, lw // tx
                if lvl == 0:
                    tie = prev_t[0, 0] * 0.0
                    u_t = jnp.zeros((th, tw), jnp.float32) + tie
                    v_t = jnp.zeros((th, tw), jnp.float32) + tie
                elif not sharded[lvl - 1]:
                    # Replicated -> sharded transition: each device
                    # upsamples straight into its own tile.
                    u_t, v_t = dist_pyramid.replicated_to_sharded_upsample(
                        u, v, (lh, lw), ty=ty, tx=tx
                    )
                else:
                    u_t, v_t = dist_pyramid.sharded_upsample_flow(
                        u_t, v_t, dims[lvl - 1], (lh, lw), ty=ty, tx=tx
                    )
                u_t, v_t = refine_sharded(
                    tiles_prev[lvl], tiles_curr[lvl], u_t, v_t, lvl
                )
            return u_t, v_t

        # Static unrolled loop over the LOCAL batch instead of vmap:
        # equivalent XLA program for the serving case (local batch 1 —
        # one frame pair per data-parallel shard), and it unblocks
        # Pallas interpret mode, whose ordered IO effects refuse to run
        # under shard_map+vmap but are fine under shard_map alone
        # (measured round 4; the round-3 blocker was the vmap). This is
        # what lets the CPU-mesh dryrun exercise the REAL kernel code
        # path (__graft_entry__.dryrun_multichip stage 1b) rather than
        # only the jnp twins.
        outs = [one(prev_l[i], curr_l[i]) for i in range(prev_l.shape[0])]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    sharding = NamedSharding(mesh, spec)
    frame_prev = jax.device_put(frame_prev, sharding)
    frame_curr = jax.device_put(frame_curr, sharding)
    return jax.jit(step)(frame_prev, frame_curr)
