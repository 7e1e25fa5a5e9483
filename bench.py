#!/usr/bin/env python3
"""tpuflow headline benchmark: pyramidal Lucas-Kanade at 1080p, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config 4): 3-level pyramidal LK on natural
mountain-texture frames at 1080p, fast TPU path (fused Pallas LK kernel +
banded Pallas warp). The fast path's kernels are bit-identical to the
parity path for in-band flow; its RTL-style +-8 px clamp only engages on
unbounded border-garbage vectors, where it *improves* suite metrics
(docs/verification_results_pallas.md vs the parity snapshot).

The headline config is ``production`` (the framework's serving default:
adaptive per-level vertical warp band + relaxed-order LK kernel), gated
against its own committed TPU baseline in scripts/tpu_fastpath_check.sh
stage 5. Its 13-pattern accuracy profile vs the reference baseline is
IDENTICAL to the full-band fast path's (the adaptive band selects the
full band whenever the coarse solve sees real vertical motion, and the
relaxed-order reassociation is ~1e-6): both deviate from the float32
reference only on translate_large pyramidal (the +-8 px clamp,
equal-or-better everywhere else). r1/r2 headline numbers (134-226 fps)
were captured with ``--config default``; the progression table in
docs/DESIGN.md section 5 carries both series.

``vs_baseline``: the reference FPGA accelerator achieved ~100 fps at
320x240 *single-scale* (7.7 MHz achieved clock, 76,800 cycles/frame;
BASELINE.md "Frame throughput"). vs_baseline = our 1080p *pyramidal*
fps / 100 — i.e. how many times faster than the reference hardware's
achieved frame rate, while processing 27x more pixels per frame and the
full coarse-to-fine pyramid instead of one scale.

Timing methodology: the axon tunnel's ``block_until_ready`` does not
synchronize with device execution, so dispatch-loop timing reads ~0.
We time a jitted ``lax.fori_loop`` that chains N pyramidal solves
through a data dependency with a forced scalar readback, and report the
marginal per-frame time between two loop lengths — differencing cancels
the tunnel's fixed dispatch/readback overhead.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def make_frames(height=1080, width=1920, dx=2.0, dy=0.0):
    """Natural texture frame pair with known sub-pixel motion (the
    reference's RTL-sim scenario: generate_test_frames_natural.py with
    --displacement-x 2)."""
    from PIL import Image
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval.patterns import DEFAULT_TEXTURE

    img = Image.open(DEFAULT_TEXTURE).convert("L").resize(
        (width, height), Image.Resampling.BILINEAR
    )
    f0 = np.array(img, dtype=np.float32)
    f1 = nd_shift(f0, (dy, dx), order=1, mode="constant", cval=128.0).astype(
        np.float32
    )
    return f0, f1


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.flow import lucas_kanade_pyramidal_step
    from tpuflow.kernels import jnp_ref

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument(
        "--config", type=str, default="production",
        choices=sorted(PYRAMID_CONFIGS),
        help="named pyramid config; the headline (driver) run uses the "
        "gated production config (adaptive vertical band + relaxed-order "
        "kernels) — pass 'default' for the exact-order full-band path "
        "the r1/r2 headlines were captured with",
    )
    args = parser.parse_args()

    h, w = args.height, args.width
    f0, f1 = make_frames(h, w)
    a = jnp.asarray(f0)
    b = jnp.asarray(f1)
    cfg = PYRAMID_CONFIGS[args.config]

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, b, n):
        # Streaming form (BASELINE config 4 is a frame *stream*): each
        # step consumes one new frame, building its pyramid once and
        # carrying it to the next pair — bit-identical per pair to the
        # two-frame API (tests/test_pyramidal.py equivalence test).
        # The stream alternates a/b (two steps per loop iteration, no
        # per-step frame select) so EVERY pair carries the full 2 px
        # motion — a b-then-b stream converges in one iteration per
        # level and overstates fps ~2.3x (measured 524 vs ~230).
        pyr0 = jnp_ref.build_gaussian_pyramid(a, cfg.levels, cfg.scale_factor)

        def body(i, state):
            pyr, u = state
            u1, _, pyr1 = lucas_kanade_pyramidal_step(
                pyr, b + u * 1e-9, cfg, backend="pallas"
            )
            u2, _, pyr2 = lucas_kanade_pyramidal_step(
                pyr1, a + u1 * 1e-9, cfg, backend="pallas"
            )
            return pyr2, u2

        _, u = jax.lax.fori_loop(
            0, n, body, (pyr0, jnp.zeros((h, w), jnp.float32))
        )
        return u[0, 9]

    n_short, n_long = 5, 30
    for n in (n_short, n_long):
        float(loop(a, b, n))  # compile
        float(loop(a, b, n))  # tunnel warm-up
    best = {}
    for n in (n_short, n_long):
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(a, b, n))
            t = min(t, time.perf_counter() - t0)
        best[n] = t

    # Two streamed frames per loop iteration (the a/b alternation above).
    per_frame = (best[n_long] - best[n_short]) / ((n_long - n_short) * 2)
    fps = 1.0 / per_frame
    label = "1080p" if (h, w) == (1080, 1920) else f"{w}x{h}"
    suffix = "" if args.config == "production" else f"_{args.config}"
    headline = label == "1080p" and args.config == "production"
    print(
        json.dumps(
            {
                "metric": f"pyramidal_lk_{label}_fps_per_chip{suffix}",
                "value": round(fps, 2),
                "unit": "frames/s",
                # The /100 comparison is defined against the reference
                # hardware's 320x240 single-scale rate specifically for
                # the 1080p default-config headline (docstring); other
                # flag combinations have no meaningful denominator.
                "vs_baseline": round(fps / 100.0, 2) if headline else None,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
