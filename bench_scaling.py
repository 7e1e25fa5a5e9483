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

# Tiled-design constants (r5 distributed-coarse pyramid,
# tpuflow/sharding/tiled_pyramidal.py + sharding/dist_pyramid.py):
# per-frame communication is halo strips, not frame gathers. A level
# whose tile is too small (or whose dims don't divide the mesh) stays
# replicated, and the coarsest SHARDED level is all_gathered once to
# seed the replicated build — the model charges exactly what the code
# does, via the same _shard_plan the code uses.
WARP_HALO_PX = 8 + 1      # PyramidConfig.max_disp + 1 (default band)
LK_APRON_PX = 3           # Sobel + half-window
BUILD_HALO_PX = 10        # banded downsample overhang (sigma=2)
REFINE_ITERS = 3


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
    - "tiled": one frame sharded (1, ty, tx), r5 distributed-coarse
      design. Per frame and device: sharded compute for every level the
      plan shards + replicated compute for the rest + ONE all_gather of
      the coarsest sharded level (zero when everything shards — 1080p
      on (2,2)/(2,4)/(2,8), 4K through (4,4)) + halo strips (per
      refine iteration: warp band + LK apron; per build step: the
      banded-operator overhang). Cross-host, only the strips/gather
      share crossing the host boundary rides DCN — the r4 model's
      full-frame DCN gather term (0.66 ms at 1080p, efficiency 0.09 at
      16 chips) is gone by construction.
    """
    import json as _json

    repo = os.path.dirname(os.path.abspath(__file__))
    profile_paths = [
        os.path.join(repo, p) if not os.path.isabs(p) else p
        for p in (profile_paths or [
            "benchmarks/r05/profile_1080p_production.json",
            "benchmarks/r05/profile_4k_production.json",
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

        # --- tiled axis (r5 distributed-coarse pyramid) ---
        from tpuflow.sharding.tiled_pyramidal import (
            _level_shapes, _shard_plan,
        )

        for ty, tx in ((1, 2), (2, 2), (2, 4), (4, 4), (2, 8)):
            p = ty * tx
            hosts = max(1, p // CHIPS_PER_HOST)
            dims = _level_shapes(h, w, 3, 0.5)
            plan = _shard_plan(dims, ty, tx, WARP_HALO_PX)
            tot_px = sum(a * b for a, b in dims)
            repl_px = sum(
                a * b for (a, b), s in zip(dims, plan) if not s
            )
            t_repl = t1_ms * repl_px / tot_px
            t_shard = t1_ms * (tot_px - repl_px) / tot_px / p
            first = plan.index(True)
            # One gather of the coarsest sharded level seeds the
            # replicated build (zero when everything shards).
            if first == 0:
                ag_bytes = 0.0
            else:
                lh0, lw0 = dims[first]
                ag_bytes = 2 * lh0 * lw0 * 4 * (p - 1) / p
            # Halo strips (bottleneck-device view), split by exchange
            # axis so the host boundary's DCN share can be charged.
            row_bytes = col_bytes = 0.0
            for lvl, (lh, lw) in enumerate(dims):
                if not plan[lvl]:
                    continue
                th_, tw_ = lh / ty, lw / tx
                strip = 2 * (WARP_HALO_PX + 2 * LK_APRON_PX) * 4
                row_bytes += REFINE_ITERS * strip * tw_
                col_bytes += REFINE_ITERS * strip * th_
                if lvl > first:
                    # Build exchange on level lvl produced level lvl-1
                    # (two frames' pyramids).
                    row_bytes += 2 * 2 * BUILD_HALO_PX * tw_ * 4
                    col_bytes += 2 * 2 * BUILD_HALO_PX * th_ * 4
            if hosts > 1:
                dcn_share = (hosts - 1) / hosts
                ag_ms = (
                    ag_bytes * (1 - dcn_share) / ICI_GBPS
                    + ag_bytes * dcn_share / DCN_GBPS
                ) / 1e6
                # The host boundary cuts ONE mesh axis (the longer one);
                # a boundary device trades one of its two strip
                # neighbors over DCN.
                dcn_axis = row_bytes if ty >= tx else col_bytes
                ici_axis = col_bytes if ty >= tx else row_bytes
                halo_ms = (
                    dcn_axis / 2 / DCN_GBPS
                    + (dcn_axis / 2 + ici_axis) / ICI_GBPS
                ) / 1e6
            else:
                ag_ms = ag_bytes / ICI_GBPS / 1e6
                halo_ms = (row_bytes + col_bytes) / ICI_GBPS / 1e6
            t = t_repl + t_shard + ag_ms + halo_ms
            eff = t1_ms / (p * t)
            rows.append({
                "model": "tiled", "resolution": f"{w}x{h}",
                "config": prof["config"], "chips": p, "hosts": hosts,
                "mesh": f"1x{ty}x{tx}",
                "sharded_levels": sum(plan), "levels": len(plan),
                "gather_ms": round(ag_ms, 4),
                "halo_ms": round(halo_ms, 4),
                "comm_ms": round(ag_ms + halo_ms, 4),
                "replicated_coarse_ms": round(t_repl, 3),
                "predicted_fps": round(1e3 / t, 1),
                "predicted_efficiency": round(eff, 3),
            })
    doc = {
        "assumptions": {
            "ici_gbps": ICI_GBPS,
            "dcn_gbps": DCN_GBPS,
            "chips_per_host": CHIPS_PER_HOST,
            "warp_halo_px": WARP_HALO_PX,
            "lk_apron_px": LK_APRON_PX,
            "build_halo_px": BUILD_HALO_PX,
            "refine_iters": REFINE_ITERS,
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
            "benchmarks/r05/scaling_model.json",
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"# wrote {out}", file=sys.stderr)
    else:
        main()
