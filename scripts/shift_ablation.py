#!/usr/bin/env python3
"""Isolate the cost Mosaic pays for misaligned slices (VERDICT r2 weak
#2): the fused LK kernel runs at ~2.2x its computed VPU op floor, with
the residual attributed to retiling/copy ops around misaligned shifted
views — this measures that attribution directly instead of inferring it.

Three pallas microkernels with IDENTICAL op counts (16 row-shifted adds
+ 16 col-shifted adds on a VMEM-resident f32 tile), differing only in
slice start alignment:

  aligned     row starts multiples of 8, col starts multiples of 128
              (vreg-tile aligned: a slice is a plain register read)
  misaligned  row starts 1,2,3,... col starts 1,2,3,... (every slice
              straddles vreg boundaries -> Mosaic inserts lane/sublane
              shift ops)
  rows_only / cols_only  misaligned on one axis at a time (separates
              sublane-shift from lane-shift cost)

All offsets are DISTINCT so CSE cannot collapse the slices (the
"constant slice" trap, DESIGN.md §3). Timing: marginal fori-loop
difference (bench.py method — block_until_ready does not synchronize
through this machine's tunnel).

Run on the real TPU:  python scripts/shift_ablation.py
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 256, 2048   # VMEM tile (2 MB f32)
OUT_R, OUT_C = 64, 1024  # output tile
N_SHIFTS = 16            # adds per axis


def _offsets(kind: str):
    if kind == "aligned":
        r = [8 * i for i in range(N_SHIFTS)]
        c = [128 * (i % 8) for i in range(N_SHIFTS)]
        # distinct (r, c) pairs even where c repeats: r differs.
    elif kind == "misaligned":
        r = [1 + i for i in range(N_SHIFTS)]
        c = [1 + i for i in range(N_SHIFTS)]
    elif kind == "rows_only":
        r = [1 + i for i in range(N_SHIFTS)]
        c = [128 * (i % 8) for i in range(N_SHIFTS)]
    elif kind == "cols_only":
        r = [8 * i for i in range(N_SHIFTS)]
        c = [1 + i for i in range(N_SHIFTS)]
    else:
        raise ValueError(kind)
    return r, c


def make_fn(kind: str):
    r_off, c_off = _offsets(kind)

    def kernel(a_ref, o_ref):
        a = a_ref[...]
        acc = jax.lax.slice(a, (r_off[0], c_off[0]),
                            (r_off[0] + OUT_R, c_off[0] + OUT_C))
        # Row-shift adds then col-shift adds, distinct offsets each.
        for i in range(1, N_SHIFTS):
            acc = acc + jax.lax.slice(
                a, (r_off[i], c_off[0]), (r_off[i] + OUT_R, c_off[0] + OUT_C)
            )
        for i in range(1, N_SHIFTS):
            acc = acc + jax.lax.slice(
                a, (r_off[0], c_off[i]), (r_off[0] + OUT_R, c_off[i] + OUT_C)
            )
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_R, OUT_C), jnp.float32),
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, n):
        def body(i, carry):
            out = call(carry[:ROWS])
            # Feed the result back so iterations are serialized.
            upd = jax.lax.dynamic_update_slice(carry, out * 1e-20, (0, 0))
            return upd
        final = jax.lax.fori_loop(0, n, body, a)
        return final[0, 0]

    return loop


def marginal_us(loop, a, n_short=200, n_long=1200, reps=3):
    for n in (n_short, n_long):
        float(loop(a, n))
        float(loop(a, n))
    best = {}
    for n in (n_short, n_long):
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(a, n))
            t = min(t, time.perf_counter() - t0)
        best[n] = t
    return (best[n_long] - best[n_short]) / (n_long - n_short) * 1e6


def main():
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (ROWS, COLS), jnp.float32)
    results = {}
    for kind in ("aligned", "misaligned", "rows_only", "cols_only"):
        us = marginal_us(make_fn(kind), a)
        results[kind] = round(us, 3)
        print(f"{kind:12s} {us:8.3f} us / call "
              f"({2 * (N_SHIFTS - 1) + 1} adds on {OUT_R}x{OUT_C})")
    base = results["aligned"]
    print(json.dumps({
        "results_us": results,
        "misaligned_over_aligned": round(results["misaligned"] / base, 2),
        "rows_only_over_aligned": round(results["rows_only"] / base, 2),
        "cols_only_over_aligned": round(results["cols_only"] / base, 2),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
