"""Decompose the 4K adversarial (fast-bound) pyramidal total, stage by stage.

The committed r5 profile reads ``pyramidal total (fast)`` = 11.06 ms at 4K
(90 fps) against a >=100 fps target. The per-stage rows (warp/LK/build)
sum to ~9 ms; this script measures every composed-path term separately on
device — per-level full-band refines, flow upsampling, band selection,
pyramid build, and the streaming-step form (one build per frame, the
serving semantics bench.py measures) — so the residual glue is a number,
not a guess. Reference analog: the TB's cycle-accounted latency model
(/root/reference/tb/tb_optical_flow_top.sv:118-129).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/r5_fast_decomp.py [--height 2160 --width 3840]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=2160)
    p.add_argument("--width", type=int, default=3840)
    p.add_argument("--config", type=str, default="production")
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--streams-only", action="store_true",
                   help="measure only the composed serving-stream totals "
                   "(adaptive vs static full band), skipping the per-stage "
                   "decomposition rows")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.eval.profile import _marginal_seconds
    from tpuflow.flow import lucas_kanade_pyramidal
    from tpuflow.flow.pyramidal import (
        _refine_level,
        _select_band_index,
        lucas_kanade_pyramidal_step,
    )
    from tpuflow.kernels import jnp_ref

    cfg = PYRAMID_CONFIGS[args.config]
    h, w = args.height, args.width
    rng = np.random.default_rng(7)

    # Adversarial stream: uniform noise frames (band ladder escalates to
    # the full band; convergence never triggers).
    prev = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    curr = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    pyr_prev = [np.asarray(x) for x in jnp_ref.build_gaussian_pyramid(prev, cfg.levels)]
    pyr_curr = [np.asarray(x) for x in jnp_ref.build_gaussian_pyramid(curr, cfg.levels)]

    # Full-band per-level config (what the adversarial switch selects).
    full = dataclasses.replace(cfg, adaptive_v_bands=None, max_disp_v=cfg.max_disp)

    rows: list[tuple[str, float]] = []

    def add(name: str, secs: float) -> None:
        rows.append((name, secs * 1e3))
        print(f"{name:48s} {secs * 1e3:8.3f} ms", flush=True)

    if not args.streams_only:
        # 1. The committed fast row (the profile's harness through r4:
        #    pairwise API, the second frame loop-invariant). Kept for
        #    continuity with the r3/r4 snapshots, but see row 3 — this
        #    shape both hoists the constant frame's pyramid build AND
        #    pays the known XLA invariant-operand pathology on the
        #    pallas warps (CLAUDE.md; measured 1.26 ms apart at 4K), so
        #    it is neither the pairwise cost nor the serving cost.
        add("fast total (pairwise, 2 builds)", _marginal_seconds(
            lambda x: lucas_kanade_pyramidal(x, curr, config=cfg, backend="pallas")[0],
            (h, w), x0=np.asarray(prev)))

        # 2. Streaming-step form, prev pyramid loop-invariant.
        pyr_prev_dev = [jnp.asarray(x) for x in pyr_prev]
        add("fast total (streaming step, const prev)", _marginal_seconds(
            lambda x: lucas_kanade_pyramidal_step(pyr_prev_dev, x, cfg, backend="pallas")[0],
            (h, w), x0=np.asarray(curr)))

    # 3. THE serving-shape adversarial bound: bench.py's exact streaming
    #    loop (alternating frames, both perturbed by the carried output
    #    so every operand varies per step, one pyramid build per frame)
    #    on the noise stream. This is the number an adversarial-stream
    #    SLA is written against.
    import functools
    import time

    @functools.partial(jax.jit, static_argnames=("n",))
    def stream_loop(a, b, n):
        import jax

        pyr0 = jnp_ref.build_gaussian_pyramid(a, cfg.levels, cfg.scale_factor)

        def body(i, state):
            pyr, u = state
            u1, _, pyr1 = lucas_kanade_pyramidal_step(
                pyr, b + u * 1e-9, cfg, backend="pallas")
            u2, _, pyr2 = lucas_kanade_pyramidal_step(
                pyr1, a + u1 * 1e-9, cfg, backend="pallas")
            return pyr2, u2

        _, u = jax.lax.fori_loop(
            0, n, body, (pyr0, jnp.zeros((h, w), jnp.float32)))
        return u[0, 9]

    def stream_marginal(loop_fn):
        n_short, n_long = 5, 30
        for n in (n_short, n_long):
            float(loop_fn(prev, curr, n))
            float(loop_fn(prev, curr, n))
        best = {}
        for n in (n_short, n_long):
            t = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop_fn(prev, curr, n))
                t = min(t, time.perf_counter() - t0)
            best[n] = t
        return (best[n_long] - best[n_short]) / ((n_long - n_short) * 2)

    add("fast total (streaming, bench-form, all-varying)",
        stream_marginal(stream_loop))

    # 3b. Same loop under the STATIC full-band config — what the
    #     adversarial switch selects, minus the switch dispatch and the
    #     band-select stats. Isolates the adaptive machinery's cost in
    #     the glue.
    static_full = dataclasses.replace(
        cfg, adaptive_v_bands=None, max_disp_v=cfg.max_disp)

    @functools.partial(jax.jit, static_argnames=("n",))
    def stream_loop_static(a, b, n):
        pyr0 = jnp_ref.build_gaussian_pyramid(a, cfg.levels, cfg.scale_factor)

        def body(i, state):
            pyr, u = state
            u1, _, pyr1 = lucas_kanade_pyramidal_step(
                pyr, b + u * 1e-9, static_full, backend="pallas")
            u2, _, pyr2 = lucas_kanade_pyramidal_step(
                pyr1, a + u1 * 1e-9, static_full, backend="pallas")
            return pyr2, u2

        _, u = jax.lax.fori_loop(
            0, n, body, (pyr0, jnp.zeros((h, w), jnp.float32)))
        return u[0, 9]

    add("fast total (streaming, static full band)",
        stream_marginal(stream_loop_static))

    if args.streams_only:
        if args.json:
            from datetime import datetime, timezone

            doc = {
                "timestamp": datetime.now(timezone.utc).isoformat(),
                "height": h, "width": w, "config": args.config,
                "rows": [{"stage": k, "ms": v} for k, v in rows],
            }
            Path(args.json).parent.mkdir(parents=True, exist_ok=True)
            Path(args.json).write_text(json.dumps(doc, indent=2))
            print(f"-> {args.json}")
        return

    # 3. One pyramid build.
    def build_pad(x):
        lvl = jnp_ref.build_gaussian_pyramid(x, cfg.levels)[0]
        return jnp.pad(lvl, ((0, h - lvl.shape[0]), (0, w - lvl.shape[1])))

    add("pyramid build (1 frame)", _marginal_seconds(build_pad, (h, w), x0=np.asarray(curr)))

    # 4. Per-level full-band refine (3 iterations, no convergence on noise).
    lvl_shapes = [a.shape for a in pyr_prev]
    for level, (lh, lw) in enumerate(lvl_shapes):
        finest = level == cfg.levels - 1
        ip = jnp.asarray(pyr_prev[level])
        ic = jnp.asarray(pyr_curr[level])
        fu = jnp.asarray(rng.uniform(-cfg.max_disp, cfg.max_disp, (lh, lw)), jnp.float32)

        def refine(x, ip=ip, ic=ic, fu=fu, finest=finest):
            u, v = _refine_level(ip, ic, fu, x, full, "pallas", finest=finest)
            return u + v

        add(f"refine L{level} {lw}x{lh} full-band x{cfg.iterations}",
            _marginal_seconds(refine, (lh, lw),
                              x0=rng.uniform(-cfg.max_disp, cfg.max_disp, (lh, lw))))

    # 5. Flow upsampling between levels (2 planes + 2x scale).
    for level in range(1, cfg.levels):
        sh, sw = lvl_shapes[level - 1]
        th, tw = lvl_shapes[level]
        fu = jnp.asarray(rng.uniform(-8, 8, (sh, sw)), jnp.float32)

        def upsamp(x, fu=fu, th=th, tw=tw, sh=sh, sw=sw):
            uu, vv = jnp_ref.upsample_flow(fu, x, (th, tw))
            return jax.lax.slice(uu + vv, (0, 0), (sh, sw))

        add(f"upsample flow L{level - 1}->L{level} ({tw}x{th})",
            _marginal_seconds(upsamp, (sh, sw), x0=rng.uniform(-8, 8, (sh, sw))))

    # 6. Band-index selection at each adaptive level (full-plane interior
    #    fraction stats on the upsampled flow).
    if cfg.adaptive_v_bands is not None:
        margin = 2 * (cfg.max_disp + cfg.window_size)
        for level in range(1, cfg.levels):
            lh, lw = lvl_shapes[level]

            def sel(x, lh=lh, lw=lw):
                idx = _select_band_index(
                    x, cfg.adaptive_v_bands, cfg.adaptive_v_frac, margin)
                return x + idx.astype(jnp.float32)

            add(f"band select L{level} ({lw}x{lh})",
                _marginal_seconds(sel, (lh, lw), x0=rng.uniform(-8, 8, (lh, lw))))

    named = dict(rows)
    accounted = (
        named["pyramid build (1 frame)"]
        + sum(v for k, v in rows if k.startswith(("refine", "upsample", "band select")))
    )
    streaming = named["fast total (streaming, bench-form, all-varying)"]
    print(f"\n{'accounted (build + refines + upsample + select)':48s} {accounted:8.3f} ms")
    print(f"{'residual glue (serving total - accounted)':48s} {streaming - accounted:8.3f} ms")

    if args.json:
        from datetime import datetime, timezone

        doc = {
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "height": h, "width": w, "config": args.config,
            "rows": [{"stage": k, "ms": v} for k, v in rows],
            "accounted_ms": accounted,
            "residual_glue_ms": streaming - accounted,
        }
        Path(args.json).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json).write_text(json.dumps(doc, indent=2))
        print(f"-> {args.json}")


if __name__ == "__main__":
    main()
