"""Round-5 warp tile_rows sweep (real TPU).

The banded warp's default tile_rows budget assumes ~60 live full-width
f32 planes — sized for the EXACT kernel's temporaries. At 4K width it
degenerates to 8-row tiles: the (tile + 2*dpad)-row DMA slab then
re-reads the frame ~4x and the per-tile index/fraction prelude
amortizes over almost nothing. The packed kernels hold fewer live
planes, so bigger tiles should fit. Measure u8/u16/exact at 1080p and
4K across tile_rows; re-measure surprising readings (tunnel jitter,
CLAUDE.md).
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from tpuflow.kernels import pallas_warp


def marginal_ms(fn, shape, x0, n1=20, n2=100):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, carry):
            return fn(x + carry) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.zeros(shape, jnp.float32))[0, 9]
    x = jnp.asarray(x0, jnp.float32)
    for n in (n1, n2):
        float(loop(x, n)); float(loop(x, n))
    ts = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(loop(x, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n2] - ts[n1]) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(1)
    for h, w in [(1080, 1920), (2160, 3840)]:
        curr = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
        curr_i = jnp.floor(curr)
        u0 = jnp.asarray(rng.uniform(-3, 3, (h, w)), jnp.float32)
        for mode in ("u8", "u16", "exact"):
            for tr in (None, 16, 24, 32, 40, 48):
                kw = dict(max_disp=8, clamp_flow=True, tile_rows=tr)
                img = curr
                if mode == "u8":
                    kw["packed_u8"] = True; img = curr_i
                elif mode == "u16":
                    kw["packed_u16"] = True
                fn = lambda x: pallas_warp.warp_image_banded(
                    img, u0, x * 0 + u0, **kw)
                try:
                    ms = marginal_ms(fn, (h, w), np.asarray(u0))
                except Exception as e:
                    print(f"{w}x{h} {mode:5s} tr={tr}: FAIL {type(e).__name__}",
                          flush=True)
                    continue
                print(f"{w}x{h} {mode:5s} tr={tr}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
