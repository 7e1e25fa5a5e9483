"""Per-stage latency + roofline accounting for the flow pipeline.

The reference's "profiler" is Vivado timing/utilization reports plus an
analytical pipeline-latency model in the testbench
(tb_optical_flow_top.sv:118-129; SURVEY.md §5). The TPU equivalent:
measure each pipeline stage on device and compare against a per-stage
bytes/FLOPs roofline model.

Timing method: through the axon tunnel ``block_until_ready`` does not
synchronize, so each stage is timed as the *marginal* cost between two
serialized ``lax.fori_loop`` lengths with a forced scalar readback —
the differencing cancels fixed dispatch/readback overhead.
"""

from __future__ import annotations

import functools
import time

import numpy as np

# Approximate v5e chip ceilings (public figures; used only to report
# achieved fractions).
HBM_GBPS = 819.0


def _marginal_seconds(
    make_body, shape, n1: int = 20, n2: int = 100, x0=None
) -> float:
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, carry):
            return make_body(x + carry) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.zeros(shape, jnp.float32))[0, 9]

    if x0 is None:
        rng = np.random.default_rng(0)
        x0 = rng.uniform(0, 255, shape)
    x = jnp.asarray(x0, jnp.float32)
    for n in (n1, n2):
        float(loop(x, n))
        float(loop(x, n))
    ts = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n2] - ts[n1]) / (n2 - n1)


def _stream_marginal_seconds(prev, curr, cfg, n1: int = 5, n2: int = 30) -> float:
    """Marginal per-frame seconds of the SERVING-shape pyramidal stream.

    bench.py's exact loop: alternating frames, each perturbed by the
    carried output (so every pallas operand varies per step — the r5
    decomposition measured the pairwise-API harness 1.26 ms apart from
    this at 4K because a loop-invariant frame both hoists its pyramid
    build and trips the known XLA invariant-operand pathology,
    CLAUDE.md), one pyramid build per frame, 2 frames per iteration.
    """
    import jax
    import jax.numpy as jnp

    from tpuflow.flow.pyramidal import lucas_kanade_pyramidal_step
    from tpuflow.kernels import jnp_ref

    h, w = prev.shape

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, b, n):
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

    for n in (n1, n2):
        float(loop(prev, curr, n))
        float(loop(prev, curr, n))
    best = {}
    for n in (n1, n2):
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(prev, curr, n))
            t = min(t, time.perf_counter() - t0)
        best[n] = t
    return (best[n2] - best[n1]) / ((n2 - n1) * 2)


def _natural_pair(h: int, w: int, dx: float = 2.0):
    """Natural mountain-texture frame pair with 2 px horizontal motion —
    the reference RTL-sim scenario (generate_test_frames_natural.py
    --displacement-x 2) and the bench.py headline stream."""
    from PIL import Image
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval.patterns import DEFAULT_TEXTURE

    img = Image.open(DEFAULT_TEXTURE).convert("L").resize(
        (w, h), Image.Resampling.BILINEAR
    )
    f0 = np.array(img, dtype=np.float32)
    f1 = nd_shift(f0, (0.0, dx), order=1, mode="constant", cval=128.0)
    return f0, f1.astype(np.float32)


def profile_pipeline(
    height: int = 1080, width: int = 1920, config: str = "default"
) -> list[dict]:
    """Measure each stage at (height, width); returns report rows.

    ``config``: named PyramidConfig — ``narrow_vertical`` profiles the
    production vertical-band warp and pipeline.
    """
    import jax.numpy as jnp

    from tpuflow.core import ops
    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.kernels import jnp_ref, pallas_lk, pallas_warp

    cfg = PYRAMID_CONFIGS[config]
    h, w = height, width
    px = h * w
    rng = np.random.default_rng(1)
    curr = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    u0 = jnp.asarray(rng.uniform(-3, 3, (h, w)), jnp.float32)

    stages = [
        (
            "fused LK (pallas)",
            lambda x: pallas_lk.lucas_kanade_fused(
                x, curr, relaxed_order=cfg.relaxed_order
            )[0],
            16 * px,  # 2 frame reads + 2 flow writes
        ),
        (
            "banded warp (pallas)",
            lambda x: pallas_warp.warp_image_banded(
                curr, u0, x * 0 + u0, max_disp=cfg.max_disp,
                max_disp_v=cfg.max_disp_v_effective, clamp_flow=True,
            ),
            16 * px,  # frame + 2 flows in, frame out
        ),
        (
            "gaussian blur s=2",
            lambda x: ops.gaussian_filter(x, 2.0),
            8 * px,
        ),
    ]
    if cfg.warp_packed_u8:
        # The packed corner-pair gather variant the finest level runs
        # under this config (bit-identical on integer frames; the noise
        # image's values don't affect the timing).
        stages.insert(2, (
            "banded warp (packed u8)",
            lambda x: pallas_warp.warp_image_banded(
                jnp.floor(curr), u0, x * 0 + u0, max_disp=cfg.max_disp,
                max_disp_v=cfg.max_disp_v_effective, clamp_flow=True,
                packed_u8=True,
            ),
            16 * px,
        ))
    if cfg.warp_packed_u16:
        # The packed-u16 coarse-level variant (r4): two 8.8 fixed-point
        # corners per i32 gather, halving the gather count on the
        # blurred float levels packed_u8 cannot serve.
        stages.insert(2, (
            "banded warp (packed u16)",
            lambda x: pallas_warp.warp_image_banded(
                curr, u0, x * 0 + u0, max_disp=cfg.max_disp,
                max_disp_v=cfg.max_disp_v_effective, clamp_flow=True,
                packed_u16=True,
            ),
            16 * px,
        ))
    stages += [
        (
            "resize 2x down (MXU)",
            lambda x: jnp.pad(
                ops.resize_bilinear(x, h // 2, w // 2),
                ((0, h - h // 2), (0, w - w // 2)),
            ),
            5 * px,
        ),
        (
            "pyramid build (3 lvl)",
            # Pad the coarsest level back to (h, w) so the timing chain
            # depends on the whole build (level [2] is the input itself
            # and would measure a no-op).
            lambda x: jnp.pad(
                (lvl := jnp_ref.build_gaussian_pyramid(x, 3)[0]),
                ((0, h - lvl.shape[0]), (0, w - lvl.shape[1])),
            ),
            8 * px,
        ),
    ]

    rows = []
    for name, fn, bytes_model, *rest in stages:
        t = _marginal_seconds(fn, (h, w), x0=rest[0] if rest else None)
        row = {
            "stage": name,
            "ms": t * 1e3,
            "bytes_model": bytes_model,
        }
        if bytes_model:
            row["effective_gbps"] = bytes_model / t / 1e9
            row["hbm_fraction"] = bytes_model / t / 1e9 / HBM_GBPS
        rows.append(row)

    # Pipeline totals, measured in the SERVING shape (bench.py's
    # streaming loop: one pyramid build per frame, every operand varying
    # per step — see _stream_marginal_seconds; through r4 these rows used
    # the pairwise two-build API with one loop-invariant frame, which is
    # neither the pairwise nor the serving cost). Random-noise frames
    # are the *adversarial* bound for adaptive-band configs: the coarse
    # solve sees garbage vertical stats and selects the full band
    # everywhere, and convergence never exits early. The benign row runs
    # the natural mountain-texture stream with 2 px horizontal motion
    # (the bench.py / RTL-sim scenario), where the ladder selects its
    # narrow bands — the two rows bracket the config's serving range.
    noise_prev = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    rows.append({
        "stage": "pyramidal total (fast)",
        "ms": _stream_marginal_seconds(noise_prev, curr, cfg) * 1e3,
        "bytes_model": None,
    })
    if cfg.adaptive_v_bands is not None:
        nat_prev, nat_curr = _natural_pair(h, w)
        rows.append({
            "stage": "pyramidal total (benign)",
            "ms": _stream_marginal_seconds(
                jnp.asarray(nat_prev), jnp.asarray(nat_curr), cfg) * 1e3,
            "bytes_model": None,
        })
    return rows


def format_report(rows: list[dict], height: int, width: int) -> str:
    lines = [
        f"tpuflow pipeline profile @ {width}x{height} (marginal ms/frame)",
        f"{'stage':26s} {'ms':>8s} {'GB/s':>8s} {'%HBM roofline':>14s}",
    ]
    for r in rows:
        gbps = f"{r['effective_gbps']:8.0f}" if "effective_gbps" in r else "       -"
        frac = (
            f"{100 * r['hbm_fraction']:13.1f}%" if "hbm_fraction" in r else "             -"
        )
        lines.append(f"{r['stage']:26s} {r['ms']:8.3f} {gbps} {frac}")
    return "\n".join(lines)


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description="Profile the flow pipeline")
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--config", type=str, default="default",
                        help="named pyramid config (narrow_vertical "
                        "profiles the production vertical band)")
    parser.add_argument(
        "--json", type=str, default=None, metavar="PATH",
        help="additionally write the profile rows as JSON (the per-round "
        "benchmark snapshots under benchmarks/, the analog of the "
        "reference's committed raw-report directories, "
        "benchmarks/unopt_baseline_20260216/metrics.txt)",
    )
    parser.add_argument(
        "--trace", type=str, default=None, metavar="DIR",
        help="additionally capture a jax.profiler device trace of one "
        "pyramidal solve into DIR (open with TensorBoard / xprof) — the "
        "TPU analog of the reference's waveform dumps "
        "(run_sim.sh +dump_waves)",
    )
    args = parser.parse_args()
    rows = profile_pipeline(args.height, args.width, args.config)
    print(format_report(rows, args.height, args.width))
    if args.json:
        import json
        import platform
        from datetime import datetime, timezone
        from pathlib import Path

        doc = {
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "height": args.height,
            "width": args.width,
            "config": args.config,
            "host": platform.node(),
            "stages": rows,
        }
        path = Path(args.json)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(doc, indent=2))
        print(f"profile snapshot -> {path}")
    if args.trace:
        import jax
        import jax.numpy as jnp

        from tpuflow.flow import lucas_kanade_pyramidal

        rng = np.random.default_rng(0)
        a = jnp.asarray(
            rng.uniform(0, 255, (args.height, args.width)), jnp.float32
        )
        b = jnp.roll(a, 2, axis=1)
        fn = jax.jit(
            lambda p, c: lucas_kanade_pyramidal(p, c, backend="pallas")
        )
        fn(a, b)[0].block_until_ready()  # compile outside the trace
        with jax.profiler.trace(args.trace):
            u, _ = fn(a, b)
            u.block_until_ready()
        print(f"device trace -> {args.trace}")


if __name__ == "__main__":
    main()
