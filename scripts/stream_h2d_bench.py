#!/usr/bin/env python3
"""A/B measurement for the double-buffered H2D streaming path.

Old serving loop: every pair uploads BOTH frames synchronously at
dispatch (jnp.asarray(prev), jnp.asarray(curr)) — each frame crosses
host->device twice, and the upload of pair k+1 cannot start until pair
k's dispatch returns. New loop (io.stream.device_pairs): one async
device_put per frame, initiated two frames ahead of the compute that
consumes it.

Both loops run the SAME jitted pyramidal step over the SAME generated
frame sequence and are timed end-to-end with a single final sync (the
flow CLI's methodology). On tunneled hosts the absolute numbers carry
the tunnel's fixed overhead; the A/B delta is the uplift.

    python scripts/stream_h2d_bench.py [--height 480 --width 640 --frames 80]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.flow import lucas_kanade_pyramidal_step
    from tpuflow.io.stream import device_pairs
    from tpuflow.kernels import jnp_ref

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--frames", type=int, default=80)
    parser.add_argument("--config", type=str, default="default")
    args = parser.parse_args()

    h, w = args.height, args.width
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (h, w)).astype(np.float32)
    frames = [np.roll(base, i, axis=1) for i in range(args.frames)]

    cfg = PYRAMID_CONFIGS[args.config]
    step = jax.jit(
        lambda pyr, c: lucas_kanade_pyramidal_step(
            pyr, c, cfg, backend="pallas"
        )
    )

    def run_old():
        carry, mags, t0 = None, [], None
        for prev, curr in zip(frames, frames[1:]):
            p, c = jnp.asarray(prev), jnp.asarray(curr)  # 2 syncs/pair
            if carry is None:
                carry = jnp_ref.build_gaussian_pyramid(
                    p, cfg.levels, cfg.scale_factor
                )
            u, v, carry = step(carry, c)
            if t0 is None:
                u.block_until_ready()
                t0 = time.perf_counter()
            mags.append(jnp.abs(u).mean())
        total = float(jnp.stack(mags).sum())
        return time.perf_counter() - t0, total

    def run_new():
        carry, mags, t0 = None, [], None
        for prev, curr in device_pairs(frames, lookahead=2):
            if carry is None:
                carry = jnp_ref.build_gaussian_pyramid(
                    prev, cfg.levels, cfg.scale_factor
                )
            u, v, carry = step(carry, curr)
            if t0 is None:
                u.block_until_ready()
                t0 = time.perf_counter()
            mags.append(jnp.abs(u).mean())
        total = float(jnp.stack(mags).sum())
        return time.perf_counter() - t0, total

    # Warm both paths (compile + tunnel), then best-of-3 each.
    for f in (run_old, run_new):
        f()
    results = {}
    checks = {}
    for name, f in (("old_sync_double_upload", run_old),
                    ("new_device_pairs", run_new)):
        best = float("inf")
        for _ in range(3):
            dt, total = f()
            best = min(best, dt)
            checks[name] = total
        pairs = args.frames - 2  # first pair excluded by t0 placement
        results[name] = {
            "s_total": round(best, 4),
            "pairs_per_s": round(pairs / best, 1),
        }
    assert abs(checks["old_sync_double_upload"] - checks["new_device_pairs"]) < 1e-3, checks
    results["uplift"] = round(
        results["new_device_pairs"]["pairs_per_s"]
        / results["old_sync_double_upload"]["pairs_per_s"], 3,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
