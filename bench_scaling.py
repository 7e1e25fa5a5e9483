#!/usr/bin/env python3
"""Multi-chip scaling benchmark: tiled + batched flow throughput vs
device count (BASELINE.json target: >= 0.8 scaling efficiency from
1 chip -> 1 host -> N hosts).

On a single-chip machine this reports the 1-chip baseline and exits;
on a pod slice it measures each device count (data-parallel batches
over a ("batch",) mesh — frame pairs are independent, the natural DP
axis — plus the spatially tiled path) and prints per-count throughput
and scaling efficiency as JSON lines.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def measure_dp(devices, h=1080, w=1920):
    """Marginal per-frame time of data-parallel batched pyramidal flow
    across ``devices`` (one frame pair per device per step)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpuflow.flow import lucas_kanade_pyramidal

    b = len(devices)
    mesh = Mesh(np.array(devices), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    rng = np.random.default_rng(0)
    prev = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (b, h, w)), jnp.float32), sharding
    )
    curr = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (b, h, w)), jnp.float32), sharding
    )

    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, bb, n):
        def body(i, carry):
            u, v = jax.vmap(
                lambda p, c: lucas_kanade_pyramidal(p, c, backend=backend)
            )(a + carry, bb)
            return u * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.zeros((b, h, w), jnp.float32))[
            0, 0, 9
        ]

    n1, n2 = 3, 13
    for n in (n1, n2):
        float(loop(prev, curr, n))
        float(loop(prev, curr, n))
    ts = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(prev, curr, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per_step = (ts[n2] - ts[n1]) / (n2 - n1)
    return b / per_step  # frames/s aggregate


def measure_tiled(devices, h=1080, w=1920):
    """Marginal per-frame time of the spatially tiled (shard_map +
    ppermute halo) pyramidal path over a ("batch", "ty", "tx") mesh —
    the large-frame sharding axis, complementary to DP."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpuflow.sharding.tiled_pyramidal import tiled_lucas_kanade_pyramidal

    n = len(devices)
    ty = 1
    while (ty * 2) ** 2 <= n * 2 and n % (ty * 2) == 0 and h % (ty * 2) == 0:
        ty *= 2
    tx = n // ty
    if h % ty or w % tx:
        return None
    mesh = Mesh(np.array(devices).reshape(1, ty, tx), ("batch", "ty", "tx"))
    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"

    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.uniform(0, 255, (1, h, w)), jnp.float32)
    curr = jnp.asarray(rng.uniform(0, 255, (1, h, w)), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, bb, n):
        def body(i, carry):
            u, v = tiled_lucas_kanade_pyramidal(
                a + carry, bb, mesh, backend=backend
            )
            return u * 1e-9

        return jax.lax.fori_loop(
            0, n, body, jnp.zeros((1, h, w), jnp.float32)
        )[0, 0, 9]

    n1, n2 = 3, 13
    for n_ in (n1, n2):
        float(loop(prev, curr, n_))
        float(loop(prev, curr, n_))
    ts = {}
    for n_ in (n1, n2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(prev, curr, n_))
            best = min(best, time.perf_counter() - t0)
        ts[n_] = best
    per_step = (ts[n2] - ts[n1]) / (n2 - n1)
    return 1.0 / per_step


def main() -> None:
    import jax

    devices = jax.devices()
    counts = [1]
    n = len(devices)
    c = 2
    while c <= n:
        counts.append(c)
        c *= 2
    if n not in counts:
        counts.append(n)

    base = None
    for count in counts:
        fps = measure_dp(devices[:count])
        if base is None:
            base = fps
        eff = fps / (base * count)
        print(
            json.dumps(
                {
                    "metric": "pyramidal_lk_1080p_fps",
                    "devices": count,
                    "value": round(fps, 2),
                    "unit": "frames/s",
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )
        sys.stdout.flush()

    tiled = measure_tiled(devices)
    if tiled is not None:
        print(
            json.dumps(
                {
                    "metric": "tiled_pyramidal_lk_1080p_fps",
                    "devices": len(devices),
                    "value": round(tiled, 2),
                    "unit": "frames/s",
                    "mode": "spatial ty*tx shard_map + ppermute halo",
                }
            )
        )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
