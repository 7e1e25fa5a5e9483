"""Pyramidal (coarse-to-fine) Lucas-Kanade dense flow.

TPU-native equivalent of the reference's pyramidal path — the Python
golden model (python/lucas_kanade_pyramidal.py:141-228) and the RTL
pyramid_control_fsm sequence BUILD -> SOLVE_L0 -> UPSAMPLE -> WARP ->
SOLVE -> ACCUM per level (rtl/unopt/pyramid_control_fsm.sv:59-152). The
RTL's 12-state FSM becomes ordinary traced control flow: a static Python
loop over levels (shapes differ per level) and a ``lax.while_loop`` over
refinement iterations with the reference's early-exit test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflow.core.config import PyramidConfig
from tpuflow.flow.single_scale import Backend, lucas_kanade_single_scale
from tpuflow.kernels import jnp_ref


def _refine_level(
    img_prev: jax.Array,
    img_curr: jax.Array,
    flow_u: jax.Array,
    flow_v: jax.Array,
    cfg: PyramidConfig,
    backend: Backend,
    rtl_clamp: bool = False,
    finest: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Iterative warp -> residual-LK -> accumulate at one pyramid level.

    Matches reference python/lucas_kanade_pyramidal.py:201-223: the
    residual is always accumulated, then the loop exits early once both
    mean |du| and mean |dv| drop below the convergence threshold.
    """

    def cond(state):
        _, _, i, converged = state
        return jnp.logical_and(i < cfg.iterations, jnp.logical_not(converged))

    n_px = img_prev.shape[0] * img_prev.shape[1]

    def body(state):
        u, v, i, converged = state
        if backend == "pallas":
            # Fully fused iteration: the warp kernel clips the carried
            # flow to the band in-kernel (RTL saturation analog,
            # flow_solver.sv:134-144), and the refine kernel folds the
            # clip + convergence-latched accumulate + |du| partial sums
            # into the LK pass — zero XLA plane passes per iteration.
            from tpuflow.kernels import pallas_lk, pallas_warp

            # Packed-gather selection by level: the finest level IS the
            # raw frame, whose values are 0..255 integers for 8-bit
            # sources (the config's documented input contract) — it can
            # use the bit-exact packed_u8 corner-pair kernel. Coarse
            # levels are blurred floats: u8-QUANTIZING them was measured
            # and rejected (+23%/+33% u/v-MAE on translate_medium — the
            # blurred levels' gradients don't survive half-gray
            # rounding), but the r4 packed_u16 kernel's 1/256-step 8.8
            # quantization is below their gradient scale and halves the
            # gather count (suite impact gated at <10%, see
            # docs/verification_results_pallas.md).
            use_u8 = cfg.warp_packed_u8 and finest
            warped = pallas_warp.warp_image_banded(
                img_curr, u, v, max_disp=cfg.max_disp, clamp_flow=True,
                max_disp_v=cfg.max_disp_v_effective,
                packed_u8=use_u8,
                packed_u16=cfg.warp_packed_u16 and not use_u8,
            )
            u, v, sdu, sdv = pallas_lk.lucas_kanade_refine(
                img_prev,
                warped,
                u,
                v,
                converged,
                window_size=cfg.window_size,
                det_threshold=cfg.det_threshold,
                max_disp=float(cfg.max_disp),
                max_disp_v=float(cfg.max_disp_v_effective),
                relaxed_order=cfg.relaxed_order,
            )
            now_converged = jnp.logical_and(
                sdu / n_px < cfg.convergence_threshold,
                sdv / n_px < cfg.convergence_threshold,
            )
            converged = jnp.logical_or(converged, now_converged)
            return u, v, i + 1, converged
        if rtl_clamp:
            # RTL-style saturation (flow_solver.sv:134-144 analog);
            # vertical band may be narrower (PyramidConfig.max_disp_v),
            # matching the pallas fast path and the tiled path.
            u = jnp.clip(u, -cfg.max_disp, cfg.max_disp)
            v = jnp.clip(
                v, -cfg.max_disp_v_effective, cfg.max_disp_v_effective
            )
        warped = jnp_ref.warp_image(img_curr, u, v)
        du, dv = lucas_kanade_single_scale(
            img_prev,
            warped,
            cfg.window_size,
            det_threshold=cfg.det_threshold,
            backend=backend,
        )
        # Latch on convergence: under vmap the while_loop runs until every
        # batch element converges, so already-converged elements must stop
        # accumulating to keep per-frame semantics (the reference's break,
        # python/lucas_kanade_pyramidal.py:221-223).
        u = jnp.where(converged, u, u + du)
        v = jnp.where(converged, v, v + dv)
        now_converged = jnp.logical_and(
            jnp.mean(jnp.abs(du)) < cfg.convergence_threshold,
            jnp.mean(jnp.abs(dv)) < cfg.convergence_threshold,
        )
        converged = jnp.logical_or(converged, now_converged)
        return u, v, i + 1, converged

    # Tie the carry's device-varying annotation to the image data: under
    # shard_map, all-gathered frames are marked varying while a fresh
    # zeros/False init is not, and while_loop requires a stable carry
    # type. Adding a data-derived zero/False keeps values identical while
    # inheriting the variance annotation in every context.
    tie = img_prev[0, 0] * 0.0
    init = (
        flow_u + tie,
        flow_v + tie,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False) | (tie > 1.0),
    )
    u, v, _, _ = jax.lax.while_loop(cond, body, init)
    return u, v


def _select_band_index(
    flow_v: jax.Array,
    bands: tuple[int, ...],
    frac_threshold: float,
    margin: int,
) -> jax.Array:
    """Index of the narrowest adequate vertical band, from the upsampled
    coarse-level flow.

    Masked-interior, fraction-based: candidate band ``b`` is rejected if
    more than ``frac_threshold`` of interior |v| exceeds ``b - 1`` (1 px
    headroom for residual growth within the level). The border margin
    excludes warp-OOB / clamp garbage — the unmasked global max always
    saturated at the clamp and defeated the earlier two-variant dispatch
    (DESIGN.md §3); measured on translate_medium, the coarse level's
    garbage stripe is (max_disp + window) px wide and upsampling doubles
    it, so the margin must be 2x that (a 16 px margin still saw 0.87%
    contaminated pixels; 24 px leaves 0.03%). Rejection counts are
    monotone in b, so the index is just the number of rejected non-final
    candidates.
    """
    h, w = flow_v.shape
    m_y = min(margin, max((h - 1) // 2, 0))
    m_x = min(margin, max((w - 1) // 2, 0))
    interior = jnp.abs(flow_v[m_y : h - m_y, m_x : w - m_x])
    n = interior.size
    idx = jnp.asarray(0, jnp.int32)
    for b in bands[:-1]:
        frac = jnp.sum((interior > (b - 1.0)).astype(jnp.float32)) / n
        idx = idx + (frac > frac_threshold).astype(jnp.int32)
    return idx


def _refine_level_adaptive(
    img_prev: jax.Array,
    img_curr: jax.Array,
    flow_u: jax.Array,
    flow_v: jax.Array,
    cfg: PyramidConfig,
    backend: Backend,
    rtl_clamp: bool = False,
    finest: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """``_refine_level`` with the vertical band picked at the level
    boundary: one precompiled variant per candidate band, dispatched by
    ``lax.switch`` on the coarse solve's interior |v| statistics. On TPU
    only the selected branch executes (outside vmap), so benign streams
    pay the narrow band's warp cost while vertical motion keeps the full
    band — the adaptive form of the static ``narrow_vertical`` trade.
    """
    import dataclasses

    bands = cfg.adaptive_v_bands
    assert bands is not None
    margin = 2 * (cfg.max_disp + cfg.window_size)
    idx = _select_band_index(flow_v, bands, cfg.adaptive_v_frac, margin)

    def variant(b: int):
        vcfg = dataclasses.replace(cfg, max_disp_v=b, adaptive_v_bands=None)
        return lambda u, v: _refine_level(
            img_prev, img_curr, u, v, vcfg, backend, rtl_clamp, finest
        )

    return jax.lax.switch(idx, [variant(b) for b in bands], flow_u, flow_v)


def lucas_kanade_pyramidal(
    frame_prev: jax.Array,
    frame_curr: jax.Array,
    num_levels: int = 3,
    window_size: int = 5,
    num_iterations: int = 3,
    *,
    config: PyramidConfig | None = None,
    backend: Backend = "jnp",
    rtl_clamp: bool = False,
    return_levels: bool = False,
):
    """Coarse-to-fine dense flow, reference-parity semantics.

    Matches reference python/lucas_kanade_pyramidal.py:141-228: Gaussian
    pyramids (sigma = 1/scale smoothing + linspace bilinear resample),
    zero flow at the coarsest level, per level upsample-and-scale then
    ``num_iterations`` x (warp, residual LK, accumulate) with early exit.

    ``return_levels=True`` additionally returns the per-level refined
    flow fields ``[(u_0, v_0), ...]`` (coarsest first) as pure outputs —
    the TPU-native form of the reference's per-level diagnostic
    snapshots (python/lucas_kanade_pyramidal.py:226, 313-352), which
    side-effect PNG writes from inside the solve loop; here the traced
    function stays pure and ``tpuflow.eval.visualize
    .save_pyramid_levels`` renders them.

    **8-bit input contract** (configs with ``warp_packed_u8``, e.g.
    ``production``): frames must carry integer values in [0, 255] —
    i.e. come from an 8-bit source in native gray levels. A caller
    feeding NORMALIZED [0, 1] floats under such a config gets a
    silently floor-truncated (near-all-zero) finest-level warp and
    garbage flow, because the packed corner-pair gather packs whole
    gray levels into bytes. Scale such inputs by 255 (and round) or
    select a config without ``warp_packed_u8``. ``warp_packed_u16``
    configs only require values in [0, 255] (any float is fine;
    quantization step 1/256).
    """
    cfg = config or PyramidConfig(
        levels=num_levels, window_size=window_size, iterations=num_iterations
    )

    pyr_prev = jnp_ref.build_gaussian_pyramid(frame_prev, cfg.levels, cfg.scale_factor)
    pyr_curr = jnp_ref.build_gaussian_pyramid(frame_curr, cfg.levels, cfg.scale_factor)
    return lucas_kanade_pyramidal_from_pyramids(
        pyr_prev, pyr_curr, cfg, backend=backend, rtl_clamp=rtl_clamp,
        return_levels=return_levels,
    )


def lucas_kanade_pyramidal_from_pyramids(
    pyr_prev,
    pyr_curr,
    cfg: PyramidConfig,
    *,
    backend: Backend = "jnp",
    rtl_clamp: bool = False,
    return_levels: bool = False,
):
    """Coarse-to-fine refinement on prebuilt Gaussian pyramids.

    Same semantics as ``lucas_kanade_pyramidal`` given
    ``jnp_ref.build_gaussian_pyramid`` outputs — split out so streaming
    callers can reuse each frame's pyramid as ``prev`` for the next pair
    (``lucas_kanade_pyramidal_step``) instead of rebuilding it, the
    serving-path analog of the RTL keeping both frame pyramids resident
    in BRAM across the solve (optical_flow_top_pyramidal.sv:189-293).
    """
    h0, w0 = pyr_prev[0].shape
    flow_u = jnp.zeros((h0, w0), pyr_prev[0].dtype)
    flow_v = jnp.zeros((h0, w0), pyr_prev[0].dtype)

    # Adaptive vertical band applies only where the band exists at all
    # (the clamped fast/rtl paths; the jnp parity path never clamps) and
    # only at levels with a coarse predecessor to derive it from — the
    # coarsest level always refines at the full band (it is tiny and its
    # warp is cheap).
    adaptive = cfg.adaptive_v_bands is not None and (
        backend == "pallas" or rtl_clamp
    )

    levels = []
    for level in range(cfg.levels):
        img_prev = pyr_prev[level]
        img_curr = pyr_curr[level]
        if level > 0:
            flow_u, flow_v = jnp_ref.upsample_flow(flow_u, flow_v, img_prev.shape)
        finest = level == cfg.levels - 1
        if adaptive and level > 0:
            flow_u, flow_v = _refine_level_adaptive(
                img_prev, img_curr, flow_u, flow_v, cfg, backend, rtl_clamp,
                finest,
            )
        else:
            flow_u, flow_v = _refine_level(
                img_prev, img_curr, flow_u, flow_v, cfg, backend, rtl_clamp,
                finest,
            )
        if return_levels:
            levels.append((flow_u, flow_v))

    if return_levels:
        return flow_u, flow_v, levels
    return flow_u, flow_v


def lucas_kanade_pyramidal_step(
    pyr_prev,
    frame_curr: jax.Array,
    cfg: PyramidConfig,
    *,
    backend: Backend = "jnp",
    rtl_clamp: bool = False,
):
    """One streaming flow step: ``(pyr_prev, frame) -> (u, v, pyr_curr)``.

    Builds only the NEW frame's pyramid and returns it as the next
    step's carry, halving pyramid-build work on frame streams while
    staying bit-identical to per-pair ``lucas_kanade_pyramidal`` (the
    pyramid of a frame does not depend on which pair it appears in).
    Seed the carry with ``jnp_ref.build_gaussian_pyramid(first_frame,
    cfg.levels, cfg.scale_factor)``.
    """
    pyr_curr = jnp_ref.build_gaussian_pyramid(
        frame_curr, cfg.levels, cfg.scale_factor
    )
    u, v = lucas_kanade_pyramidal_from_pyramids(
        pyr_prev, pyr_curr, cfg, backend=backend, rtl_clamp=rtl_clamp
    )
    return u, v, pyr_curr
