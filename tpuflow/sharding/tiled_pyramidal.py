"""Multi-chip tiled pyramidal Lucas-Kanade flow.

Level-dependent sharding strategy (SURVEY.md §7 step 6 / §5
"halo correctness across pyramid levels"):

- **Coarse levels are replicated.** Each device all-gathers the full
  frame once (coarse levels are 1/16 + 1/4 of the pixels; replicating
  their compute costs less than halo-exchanging the pyramid build's
  radius-8 Gaussian and the global linspace resample, both of which mix
  rows across tile boundaries). Replicated computation is deterministic,
  so every device holds identical coarse flow.
- **The finest level is sharded.** Each device refines its own tile:
  per iteration the current-frame tile is halo-extended by
  ``max_disp + 1`` rows/cols (RTL-clamp-bounded warp reads,
  flow_solver.sv:134-144 analog) for the warp, then by the 3-pixel
  Sobel+window apron for the residual LK solve; convergence tests psum
  the global |residual| means.

Semantics: identical to the single-device fast path
(``lucas_kanade_pyramidal(..., rtl_clamp=True)``) — verified exactly in
tests/test_sharding.py.
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
                      max_disp_v=None, packed_u8=False, interpret=False):
    """Banded Pallas warp of a halo-extended tile (the fast-path twin of
    :func:`_warp_tile`): flow is zero-padded out to the extended shape,
    the hardware-gather kernel warps the whole extended tile (its local
    OOB mask never fires for center pixels — |flow| <= max_disp < halo),
    and the center crop gets the exact global-border zero cut-off.

    ``packed_u8`` (PyramidConfig.warp_packed_u8): the finest-level tile
    is raw-frame data (integer-valued for 8-bit sources; halo/zero
    padding stays integer), so the packed corner-pair gather kernel is
    bit-identical here like in the single-device driver. The caller
    pre-clips flow to the band, so the in-kernel clamp the packed path
    requires is a no-op re-clip."""
    from tpuflow.kernels import pallas_warp

    h, w = u.shape
    u_e = jnp.pad(u, halo)
    v_e = jnp.pad(v, halo)
    with _interpret_ctx(interpret):
        out_ext = pallas_warp.warp_image_banded(
            curr_ext, u_e, v_e, max_disp=max_disp, max_disp_v=max_disp_v,
            clamp_flow=packed_u8, packed_u8=packed_u8,
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
    from tpuflow.sharding import halo as halo_mod

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

    Matches ``lucas_kanade_pyramidal(..., rtl_clamp=True)`` exactly with
    ``backend="jnp"``; ``backend="pallas"`` swaps the per-shard warp and
    LK solves for the fused TPU kernels (same fast-path numerics as the
    single-device pallas backend).

    ``interpret=True`` runs the pallas kernels in TPU interpret mode —
    the CPU-virtual-mesh validation path (tests/conftest's 8-device
    mesh, __graft_entry__.dryrun_multichip). See :func:`_interpret_ctx`
    for why the context must live here and not at the call site, and
    the module TODO note for the remaining batch>1 constraint.
    """
    cfg = config or PyramidConfig()
    ty = mesh.shape["ty"]
    tx = mesh.shape["tx"]
    _, gh, gw = frame_prev.shape
    assert gh % ty == 0 and gw % tx == 0
    th, tw = gh // ty, gw // tx
    warp_halo = cfg.max_disp + 1
    assert th > 2 * warp_halo and tw > 2 * warp_halo, "tiles must exceed halos"

    spec = P("batch", "ty", "tx")

    def refine_fine(prev_t, curr_t, u, v, gy0, gx0):
        """Sharded finest-level iterations on local tiles."""

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
                    curr_ext, u, v, warp_halo, gy0, gx0, gh, gw,
                    cfg.max_disp, cfg.max_disp_v_effective,
                    packed_u8=cfg.warp_packed_u8, interpret=interpret,
                )
                du, dv = _local_lk_pallas(
                    prev_t, warped, gy0, gx0, gh, gw, ty, tx,
                    cfg.window_size, cfg.det_threshold,
                    interpret=interpret,
                )
            else:
                warped = _warp_tile(
                    curr_ext, u, v, warp_halo, gy0, gx0, gh, gw
                )
                avg_ext = halo_mod.exchange_halo_2d(
                    (prev_t + warped) * 0.5, HALO, ty=ty, tx=tx,
                    boundary="symm",
                )
                it_ext = halo_mod.exchange_halo_2d(
                    prev_t - warped, HALO - 1, ty=ty, tx=tx, boundary="zero"
                )
                du, dv = _local_lk(
                    avg_ext, it_ext, gy0, gx0, gh, gw,
                    cfg.window_size, cfg.det_threshold,
                )
            u2 = jnp.where(converged, u, u + du)
            v2 = jnp.where(converged, v, v + dv)
            # Global means over all tiles (psum across the spatial axes).
            sums = lax.psum(
                jnp.stack([jnp.abs(du).sum(), jnp.abs(dv).sum()]),
                ("ty", "tx"),
            )
            npix = float(gh * gw)
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
        gy0 = lax.axis_index("ty") * th
        gx0 = lax.axis_index("tx") * tw

        def one(prev_t, curr_t):
            # The interpret context wraps the whole per-shard program so
            # the COARSE-level pallas calls (_refine_level below runs
            # the single-device fast path on the replicated frame) are
            # interpreted too, not just the sharded fine refine.
            with _interpret_ctx(interpret):
                return _one_impl(prev_t, curr_t)

        def _one_impl(prev_t, curr_t):
            # Replicate the full frame for the coarse levels.
            prev_full = lax.all_gather(prev_t, "tx", axis=1, tiled=True)
            prev_full = lax.all_gather(prev_full, "ty", axis=0, tiled=True)
            curr_full = lax.all_gather(curr_t, "tx", axis=1, tiled=True)
            curr_full = lax.all_gather(curr_full, "ty", axis=0, tiled=True)

            pyr_prev = jnp_ref.build_gaussian_pyramid(prev_full, cfg.levels)
            pyr_curr = jnp_ref.build_gaussian_pyramid(curr_full, cfg.levels)

            h0, w0 = pyr_prev[0].shape
            u = jnp.zeros((h0, w0), jnp.float32)
            v = jnp.zeros((h0, w0), jnp.float32)
            from tpuflow.flow.pyramidal import _refine_level

            for level in range(cfg.levels - 1):
                if level > 0:
                    u, v = jnp_ref.upsample_flow(u, v, pyr_prev[level].shape)
                u, v = _refine_level(
                    pyr_prev[level], pyr_curr[level], u, v, cfg, backend,
                    rtl_clamp=True,
                )

            # Upsample to the finest level (replicated), slice the local
            # tile, then refine sharded.
            u, v = jnp_ref.upsample_flow(u, v, (gh, gw))
            u_t = lax.dynamic_slice(u, (gy0, gx0), (th, tw))
            v_t = lax.dynamic_slice(v, (gy0, gx0), (th, tw))
            fine_prev = lax.dynamic_slice(
                pyr_prev[cfg.levels - 1], (gy0, gx0), (th, tw)
            )
            fine_curr = lax.dynamic_slice(
                pyr_curr[cfg.levels - 1], (gy0, gx0), (th, tw)
            )
            return refine_fine(fine_prev, fine_curr, u_t, v_t, gy0, gx0)

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
