"""Round-5 ablation (VERDICT r4 item 4b): can an MXU/shift formulation
of the banded warp's HORIZONTAL interpolation beat the hardware-gather
candidate loop?

The proposed formulation — per-row banded interpolation matrices
``out_row = img_row @ W_row`` — cannot batch on the MXU: every output
row has a DIFFERENT data-dependent W_row, so each matmul has M=1 (one
LHS row against the 128x128 systolic array, <1% utilization), and
merely BUILDING each banded W_row costs one select per band offset —
i.e. exactly the shift-select form measured here. The shift-select
kernel is therefore a LOWER bound for any per-row-matrix variant
(it skips the matmul and uses the built weights directly).

Two pallas microkernels with identical outer structure (18 candidate
iterations on a resident VMEM tile, accumulating into one plane):

- ``gather``: per iteration one ``take_along_axis`` hardware gather
  (indices vary per iteration so CSE cannot merge them — the r3
  constant-slice trap) + select + multiply-add: the banded warp's
  packed-u16-style candidate step.
- ``shifts``: per iteration the same sample produced WITHOUT a gather:
  2*max_disp + 4 = 20 lane-shifted views, each gated by an equality
  select on the per-pixel offset and multiply-accumulated — the
  horizontal-interpolation-by-shifted-MAs form (= the W_row build).

Run on a real v5e; lane-misaligned slice costs make or break the
comparison, so interpret mode is meaningless here.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 18  # candidate rows at the full +-8 band
MAXD = 8


def _build(mode: str, rows: int, wp: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = wp // 128

    def kernel(x_ref, off_ref, o_ref):
        x = x_ref[0]          # (rows, wp + 256) band with lane margins
        off = off_ref[0]      # (rows, wp) i32 per-pixel offset in [-8, 9]
        gspace = (rows * nb, 128)

        def rs(a):
            return a.reshape(*gspace)

        off_r = rs(off)
        acc = jnp.zeros(gspace, jnp.float32)
        if mode == "gather":
            lane = jax.lax.broadcasted_iota(jnp.int32, gspace, 1)
            base = rs(
                jax.lax.slice(x, (0, 128), (rows, 128 + wp))
            )
            for d in range(ITERS):
                # Index varies with d -> no CSE; clip keeps it in-vreg.
                idx = jnp.clip(lane + off_r + (d - ITERS // 2), 0, 127)
                g = jnp.take_along_axis(
                    base, idx, axis=1, mode="promise_in_bounds"
                )
                acc = acc + g * (1.0 + 0.01 * d)
        else:
            for d in range(ITERS):
                part = jnp.zeros(gspace, jnp.float32)
                for dx in range(-MAXD - 1, MAXD + 3):
                    v = rs(
                        jax.lax.slice(
                            x, (0, 128 + dx), (rows, 128 + dx + wp)
                        )
                    )
                    part = jnp.where(
                        off_r == jnp.int32(dx + (d % 3) - 1), v, part
                    )
                acc = acc + part * (1.0 + 0.01 * d)
        o_ref[0] = acc.reshape(rows, wp)

    @jax.jit
    def run(x, off):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, rows, wp + 256), lambda s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, wp), lambda s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, wp), lambda s: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, rows, wp), jnp.float32),
        )(x, off)

    return run


def main() -> None:
    import jax
    import jax.numpy as jnp

    rows, wp = 64, 1920
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, rows, wp + 256)), jnp.float32)
    off = jnp.asarray(
        rng.integers(-MAXD, MAXD + 1, (1, rows, wp)), jnp.int32
    )

    for mode in ("gather", "shifts"):
        run = _build(mode, rows, wp)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(a, o, n, run=run):
            def body(i, carry):
                return run(a + carry * 1e-12, o) * 1e-9

            return jax.lax.fori_loop(
                0, n, body, jnp.zeros((1, rows, wp), jnp.float32)
            )[0, 0, 9]

        n1, n2 = 50, 400
        for n in (n1, n2):
            float(loop(x, off, n)); float(loop(x, off, n))
        ts = {}
        for n in (n1, n2):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, off, n))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        us = (ts[n2] - ts[n1]) / (n2 - n1) * 1e6
        print(f"{mode:7s}: {us:8.2f} us per {rows}x{wp} tile "
              f"({ITERS} candidate iterations)", flush=True)


if __name__ == "__main__":
    main()
