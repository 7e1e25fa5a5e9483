"""Ablation (VERDICT r4 item 4b): the warp's horizontal interpolation as
per-row banded interpolation matrices on the MXU.

The banded warp kernel is gather-issue-bound (~3 cycles/vreg-gather,
DESIGN §3); the r4 block-banded MXU resample won 2-4x over VPU taps by
moving a *shared* banded operator onto the MXU. This script measures
whether the same trick transfers to the warp's horizontal interpolation.

It cannot share operands: the interpolation matrix depends on u(y, x),
so every output row y needs its OWN (256, 128) matrix per 128-column
block — a batched stack of 1..18-row matmuls plus a per-row one-hot
build of th*256*128 compare/select elements. This script measures the
cheapest possible form of that formulation — plain XLA on TPU (full
fusion freedom, no pallas/Mosaic overhead), computing all 2*mdv+2
candidate rows' horizontal interpolation for the full frame as
einsum('ydc,ycx->ydx') over 128-column blocks — and compares it against
the production warp kernels which do the *entire* warp (horizontal +
vertical + OOB). If even this lower bound exceeds the full production
warp, any in-kernel variant is strictly worse and the formulation is
rejected with numbers, like the §2 window-sum MXU ablation.

Validates the formulation first: the einsum path's candidate planes must
bit-match the direct gather computation for in-band flow.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/r5_warp_mxu_h_ablation.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MDV = 8  # production full band
MAX_DISP = 8


def mxu_h_candidates(img_pad, x0l, x1l, fx, h, w, n_cand, dtype):
    """All candidate rows' horizontal interp via per-row banded matmuls.

    img_pad: (h + n_cand, w + 256) frame padded 128 left/right and with
    the vertical candidate apron. Returns (h, n_cand, w) where
    [y, d, x] = lerp(img_pad[y + d, x0], img_pad[y + d, x0 + 1], fx)
    with x0 the per-pixel global floor column (padded coords).
    """
    import jax
    import jax.numpy as jnp

    # f32 operands need HIGHEST or the TPU einsum silently demotes to
    # bf16 MXU passes (CLAUDE.md gotcha — measured max err 0.99 gray
    # levels at default precision); the bf16 variant is the deliberate
    # low-precision anchor and keeps the default.
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    )
    nb = w // 128
    outs = []
    for b in range(nb):
        # Window of input columns [128b + 64, 128b + 320) in padded
        # coords covers x0l, x0l+1 for output cols [128b, 128b+128).
        w0 = 128 * b + 64
        x0_rel = x0l[:, 128 * b : 128 * (b + 1)] - w0  # (h, 128) in [0, 256)
        x1_rel = x1l[:, 128 * b : 128 * (b + 1)] - w0
        fxb = fx[:, 128 * b : 128 * (b + 1)]
        c = jnp.arange(256, dtype=jnp.int32)[None, :, None]  # (1, 256, 1)
        m = (
            jnp.where(c == x0_rel[:, None, :], (1.0 - fxb)[:, None, :], 0.0)
            + jnp.where(c == x1_rel[:, None, :], fxb[:, None, :], 0.0)
        ).astype(dtype)  # (h, 256, 128)
        # Candidate stack: rows y+d of the window, batched over y.
        cand = jnp.stack(
            [img_pad[d : d + h, w0 : w0 + 256] for d in range(n_cand)], axis=1
        ).astype(dtype)  # (h, n_cand, 256)
        outs.append(
            jnp.einsum("ydc,ycx->ydx", cand, m, precision=precision)
        )  # (h, n_cand, 128)
    return jnp.concatenate(outs, axis=2).astype(jnp.float32)


def direct_candidates(img_pad, x0l, x1l, fx, h, w, n_cand):
    """Gather-based reference for the same candidate planes."""
    import jax.numpy as jnp

    planes = []
    for d in range(n_cand):
        rows = img_pad[d : d + h]  # (h, w + 256)
        c0 = jnp.take_along_axis(rows, x0l, axis=1)
        c1 = jnp.take_along_axis(rows, x1l, axis=1)
        planes.append(c0 * (1.0 - fx) + c1 * fx)
    return jnp.stack(planes, axis=1)  # (h, n_cand, w)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpuflow.eval.profile import _marginal_seconds
    from tpuflow.kernels import pallas_warp

    h, w = 1080, 1920
    n_cand = 2 * MDV + 2
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    u = jnp.asarray(rng.uniform(-MAX_DISP, MAX_DISP, (h, w)), jnp.float32)
    v = jnp.asarray(rng.uniform(-MDV, MDV, (h, w)), jnp.float32)

    # Padded frame: 128 columns each side, vertical candidate apron.
    img_pad = jnp.pad(img, ((MDV + 1, MDV + 1), (128, 128)))
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    x0f = jnp.floor(u)
    x0l = (xx + x0f.astype(jnp.int32) + 128).astype(jnp.int32)
    x1l = x0l + 1
    fx = u - x0f

    # Formulation check (f32): einsum candidates == gather candidates.
    mxu = mxu_h_candidates(img_pad, x0l, x1l, fx, h, w, n_cand, jnp.float32)
    ref = direct_candidates(img_pad, x0l, x1l, fx, h, w, n_cand)
    err = float(jnp.max(jnp.abs(mxu - ref)))
    print(f"formulation max |err| vs gather reference: {err:.2e}")
    assert err < 1e-4, "MXU-h formulation does not reproduce the candidates"

    rows = []

    def add(name, secs):
        rows.append((name, secs * 1e3))
        print(f"{name:52s} {secs * 1e3:8.3f} ms", flush=True)

    # Lower bound for the MXU-h formulation: candidates only (no vertical
    # select, no OOB, no pallas overhead), f32 and bf16 matmuls.
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        add(
            f"MXU-h candidate planes only ({tag} matmul, XLA)",
            _marginal_seconds(
                lambda x, dtype=dtype: mxu_h_candidates(
                    jnp.pad(x, ((MDV + 1, MDV + 1), (128, 128))),
                    x0l, x1l, fx, h, w, n_cand, dtype,
                )[:, 0, :],
                (h, w), x0=np.asarray(img),
            ),
        )

    # What the formulation must beat: the production kernels doing the
    # ENTIRE warp (horizontal + vertical + OOB) at the same full band.
    for kwargs, tag in (
        (dict(packed_u16=True), "packed u16"),
        (dict(packed_u8=True), "packed u8"),
        (dict(), "exact"),
    ):
        add(
            f"full production warp ({tag}), full band",
            _marginal_seconds(
                lambda x, kwargs=kwargs: pallas_warp.warp_image_banded(
                    jnp.floor(x) if kwargs.get("packed_u8") else x,
                    u, v, max_disp=MAX_DISP, max_disp_v=MDV,
                    clamp_flow=True, **kwargs,
                ),
                (h, w), x0=np.asarray(img),
            ),
        )

    import json
    from datetime import datetime, timezone

    out = Path("benchmarks/r05/warp_mxu_h_ablation.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "height": h, "width": w, "band": MDV,
        "formulation_max_err": err,
        "rows": [{"stage": k, "ms": v} for k, v in rows],
    }, indent=2))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
