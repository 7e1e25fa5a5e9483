#!/usr/bin/env python3
"""Composed-VO serving benchmark: the full on-device tracking step
(dense pyramidal flow + track advance + loss detection + keyframe
reseeding) at 480p, one chip.

Prints ONE JSON line like bench.py. This measures the round-3 serving
path (tpuflow.vo.device_loop): the whole front-end runs as a
``lax.scan`` over a frame chunk — one dispatch, zero per-frame host
syncs. The round-2 host-paced loop measured ~3 fps through the TPU
tunnel at 480p (per-frame alive-count readbacks + per-keyframe track
table pulls) while the flow kernels ran ~1600 fps; the "done" criterion
(VERDICT r2 item 1) is composed-VO within ~2x of flow-only.

Timing methodology: as bench.py — ``block_until_ready`` does not
synchronize through the axon tunnel, so we time the jitted scan at two
chunk lengths with a forced scalar readback and report the marginal
per-frame time (differencing cancels fixed dispatch/readback overhead).
The frame chunk is device-resident before timing; H2D streaming is
covered separately (tpuflow.io.stream).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from bench import make_frames
    from tpuflow.vo.pipeline import OdometrySession

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--grid-step", type=int, default=16)
    parser.add_argument("--fb-check", type=float, default=None,
                        help="also run the forward-backward culling flow "
                        "(roughly doubles flow work per frame)")
    parser.add_argument("--pyramid-config", type=str, default="default",
                        help="named flow config for the front-end "
                        "(e.g. adaptive_vertical / narrow_vertical)")
    args = parser.parse_args()

    h, w = args.height, args.width
    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    f0, f1 = make_frames(h, w)

    # Alternating a/b stream (as bench.py): every pair carries the full
    # 2 px motion so the per-level refinement loop does real work.
    n_short, n_long = 8, 32
    frames = {}
    for n in (n_short, n_long):
        stack = np.empty((n, h, w), np.float32)
        stack[0::2] = f1
        stack[1::2] = f0
        frames[n] = jax.device_put(jnp.asarray(stack))
    jax.block_until_ready(list(frames.values()))

    sess = OdometrySession(
        (float(w), float(w), w / 2.0, h / 2.0),
        grid_step=args.grid_step, backend=backend,
        fb_check_threshold=args.fb_check,
        pyramid_config=args.pyramid_config,
    )
    sess.start(f0)
    state0 = sess._dev
    fe = sess._fe

    def run(n) -> float:
        st, _obs = fe.scan_steps(state0, frames[n])
        # Forced readback through the chained state (tunnel sync).
        return float(st.xy[0, 0]) + float(st.loss_count)

    for n in (n_short, n_long):
        run(n)  # compile
        run(n)  # tunnel warm-up
    best = {}
    for n in (n_short, n_long):
        t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(n)
            t = min(t, time.perf_counter() - t0)
        best[n] = t

    per_frame = (best[n_long] - best[n_short]) / (n_long - n_short)
    fps = 1.0 / per_frame
    label = f"{w}x{h}"
    suffix = "_fb" if args.fb_check is not None else ""
    if args.pyramid_config != "default":
        suffix += f"_{args.pyramid_config}"
    print(
        json.dumps(
            {
                "metric": f"vo_serving_{label}_fps_per_chip{suffix}",
                "value": round(fps, 2),
                "unit": "frames/s",
                # The reference stops at dense flow — no VO denominator.
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
