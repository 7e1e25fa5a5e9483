"""Device sweep: LK/refine kernel tile_rows at 4K (and 1080p cross-check).

The r5 warp sweep (scripts/r5_warp_tile_sweep.py) showed the uniform
live-plane budget degenerated at 4K width (8-row tiles, ~4x slab
re-read). The fused LK and refine kernels use the same uniform budget
(~30 planes / 14 MB / 64-row cap -> 24 rows at w=3840); the refine
kernel runs 9x per 4K frame, so a taller-tile win transfers directly to
the adversarial fast bound. Per the tunnel-jitter rule, surprising
readings are re-measured before acting.

Harness note (first run's mistake, kept as a warning): the timing body
must CONSUME every kernel output — a body returning only ``u`` lets XLA
DCE the v/sdu/sdv outputs out of the pallas custom call, which frees
their VMEM blocks and lets tile sizes compile (and measure fast) that
OOM the 16 MB scoped budget in the real pipeline where all outputs are
live. refine@4K@40rows measured 0.70 ms u-only, then failed compile
with all outputs consumed.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/r5_lk_tile_sweep.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax.numpy as jnp

    from tpuflow.eval.profile import _marginal_seconds
    from tpuflow.kernels import pallas_lk

    rng = np.random.default_rng(5)
    results = {}
    for h, w in ((2160, 3840), (1080, 1920)):
        prev = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
        u0 = jnp.asarray(rng.uniform(-8, 8, (h, w)), jnp.float32)
        v0 = jnp.asarray(rng.uniform(-8, 8, (h, w)), jnp.float32)
        conv = jnp.asarray(False)
        def refine_all(x, tile):
            u, v, sdu, sdv = pallas_lk.lucas_kanade_refine(
                prev, x, u0, v0, conv, tile_rows=tile, relaxed_order=True)
            return u + v + sdu * 1e-9 + sdv * 1e-9

        def fused_all(x, tile):
            u, v = pallas_lk.lucas_kanade_fused(
                prev, x, tile_rows=tile, relaxed_order=True)
            return u + v

        for tile in (None, 16, 24, 32, 40, 48, 64):
            for name, fn in (
                ("refine", lambda x, tile=tile: refine_all(x, tile)),
                ("fused", lambda x, tile=tile: fused_all(x, tile)),
            ):
                key = f"{name} {w}x{h} tile={tile}"
                try:
                    t1 = _marginal_seconds(fn, (h, w)) * 1e3
                    t2 = _marginal_seconds(fn, (h, w)) * 1e3
                except Exception as e:  # noqa: BLE001 — VMEM OOM rejects
                    print(f"{key:36s} FAILED: {str(e)[:90]}", flush=True)
                    continue
                results[key] = (t1, t2)
                print(f"{key:36s} {t1:7.3f} / {t2:7.3f} ms", flush=True)

    import json

    out = Path("benchmarks/r05/lk_tile_sweep.json")
    out.write_text(json.dumps(
        {k: {"ms_run1": a, "ms_run2": b} for k, (a, b) in results.items()},
        indent=2))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
