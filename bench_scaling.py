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


# ---------------------------------------------------------------------------
# Analytic scaling model (bench_scaling.py --model)
# ---------------------------------------------------------------------------

# Interconnect assumptions (public v5e figures; the model's falsifiable
# inputs — a real pod run replaces them with measurements):
# - ICI: 1,600 Gbps aggregate interchip bandwidth per v5e chip
#   (cloud.google.com TPU v5e system architecture) -> 200 GB/s; a 2-D
#   ring neighbor link sustains ~1/4 of that, and the all_gather path
#   is modeled at the aggregate (XLA's ring all-gather keeps every link
#   busy).
# - DCN: 100 Gbps effective per-host NIC share for this traffic class
#   -> 12.5 GB/s (conservative; v5e hosts expose up to 400 Gbps).
ICI_GBPS = 200.0
DCN_GBPS = 12.5
CHIPS_PER_HOST = 8

# Fraction of single-chip pyramidal compute spent on the REPLICATED
# coarse levels in the tiled design (replicated-coarse + sharded-fine,
# tpuflow/sharding/tiled_pyramidal.py): per-pixel work by level for a
# 3-level pyramid = 1 : 1/4 : 1/16 -> coarse share = (1/4 + 1/16) /
# (1 + 1/4 + 1/16) ~= 0.238. Small grids have better-than-pixel-count
# fixed overheads, so this is an upper bound on the replicated share
# (conservative for efficiency).
COARSE_COMPUTE_FRACTION = 0.238


def _load_profile(path):
    import json as _json
    from pathlib import Path

    p = Path(path)
    if not p.exists():
        return None
    doc = _json.loads(p.read_text())
    rows = {r["stage"]: r["ms"] for r in doc["stages"]}
    total = rows.get("pyramidal total (benign)") or rows.get(
        "pyramidal total (fast)"
    )
    return {"h": doc["height"], "w": doc["width"], "ms": total,
            "config": doc.get("config", "?")}


def scaling_model(profile_paths=None):
    """Predicted multi-chip/multi-host throughput + efficiency from the
    committed single-chip profiles and the interconnect assumptions
    above (VERDICT r3 item 5: the >=0.8 BASELINE claim needs a model a
    real pod run can falsify).

    Axes modeled:
    - "dp": data-parallel over independent frame pairs. The flow
      program has ZERO inter-chip communication on this axis; the model
      charges only the per-host input feed (H2D is double-buffered and
      async, measured in scripts/stream_h2d_bench.py) and predicts
      efficiency 1.0 on-chip. Cross-host DP adds nothing (frames stay
      host-local; the VO back-end's psum of the reduced camera system
      is ~K^2*1.4 KB per SOLVE, amortized over whole chunks — <0.1% of
      frame time at K=32, charged below).
    - "tiled": one frame sharded (1, ty, tx). Per frame and device:
      replicated coarse compute + sharded fine compute + the coarse
      replication all_gather of both frames (the dominant traffic) +
      per-iteration halo exchanges (9 px warp band + 3 px LK apron).
    """
    import json as _json

    repo = os.path.dirname(os.path.abspath(__file__))
    profile_paths = [
        os.path.join(repo, p) if not os.path.isabs(p) else p
        for p in (profile_paths or [
            "benchmarks/r04/profile_1080p_production.json",
            "benchmarks/r04/profile_4k_production.json",
            "benchmarks/r03/profile_1080p_production.json",
        ])
    ]
    profiles = []
    seen = set()
    for path in profile_paths:
        prof = _load_profile(path)
        if prof is None or (prof["h"], prof["config"]) in seen:
            continue
        seen.add((prof["h"], prof["config"]))
        profiles.append(prof)

    rows = []
    for prof in profiles:
        h, w, t1_ms = prof["h"], prof["w"], prof["ms"]
        frame_bytes = h * w * 4
        t_coarse = t1_ms * COARSE_COMPUTE_FRACTION
        t_fine = t1_ms - t_coarse

        # --- DP axis ---
        for chips in (2, 4, 8, 16):
            hosts = max(1, chips // CHIPS_PER_HOST)
            # BA reduced-camera psum, amortized: K=32 keyframes, 6Kx6K
            # f32 system + per-camera blocks ~ 1.5 MB per solve, one
            # solve per 64-frame chunk, over DCN when hosts > 1.
            ba_bytes = 1.5e6 / 64
            ba_ms = (
                ba_bytes / (DCN_GBPS if hosts > 1 else ICI_GBPS) / 1e6
            )
            t = t1_ms + ba_ms
            eff = t1_ms / t
            rows.append({
                "model": "dp", "resolution": f"{w}x{h}",
                "config": prof["config"], "chips": chips, "hosts": hosts,
                "predicted_fps": round(1e3 / t * chips, 1),
                "predicted_efficiency": round(eff, 3),
            })

        # --- tiled axis ---
        for ty, tx in ((1, 2), (2, 2), (2, 4), (4, 4)):
            p = ty * tx
            hosts = max(1, p // CHIPS_PER_HOST)
            th, tw = h / ty, w / tx
            # all_gather: each device RECEIVES (p-1)/p of both frames.
            ag_bytes = 2 * frame_bytes * (p - 1) / p
            # Host-crossing share of the gather rides DCN.
            if hosts > 1:
                dcn_share = (hosts - 1) / hosts
                ag_ms = (
                    ag_bytes * (1 - dcn_share) / ICI_GBPS
                    + ag_bytes * dcn_share / DCN_GBPS
                ) / 1e6
            else:
                ag_ms = ag_bytes / ICI_GBPS / 1e6
            # Halo exchange per fine iteration (3): warp halo 9 px on
            # curr + 3 px LK apron on (prev, warped).
            halo_px = 2 * (9 + 2 * 3) * (th + tw)
            halo_ms = 3 * halo_px * 4 / ICI_GBPS / 1e6
            t = t_coarse + t_fine / p + ag_ms + halo_ms
            eff = t1_ms / (p * t)
            rows.append({
                "model": "tiled", "resolution": f"{w}x{h}",
                "config": prof["config"], "chips": p, "hosts": hosts,
                "mesh": f"1x{ty}x{tx}",
                "comm_ms": round(ag_ms + halo_ms, 3),
                "replicated_coarse_ms": round(t_coarse, 3),
                "predicted_fps": round(1e3 / t, 1),
                "predicted_efficiency": round(eff, 3),
            })
    doc = {
        "assumptions": {
            "ici_gbps": ICI_GBPS,
            "dcn_gbps": DCN_GBPS,
            "chips_per_host": CHIPS_PER_HOST,
            "coarse_compute_fraction": COARSE_COMPUTE_FRACTION,
            "single_chip_profiles": [
                {k: p[k] for k in ("h", "w", "ms", "config")}
                for p in profiles
            ],
        },
        "predictions": rows,
    }
    return doc


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
    if "--model" in sys.argv:
        doc = scaling_model()
        for row in doc["predictions"]:
            print(json.dumps(row))
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks/r04/scaling_model.json",
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"# wrote {out}", file=sys.stderr)
    else:
        main()
