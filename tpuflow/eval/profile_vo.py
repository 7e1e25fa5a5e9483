"""Per-stage latency decomposition of the composed VO serving step.

VERDICT r4 item 2: flow-only runs 555 fps at 1080p while the VO serving
loop runs 353 — ~1.0 ms/frame of tracking overhead with no committed
profile. This is the device_loop analog of ``eval.profile`` for the
flow pipeline, and of the reference TB's cycle-accounted pipeline
latency model (/root/reference/tb/tb_optical_flow_top.sv:118-129).

Stages measured (marginal fori-loop method — ``block_until_ready``
does not synchronize through the axon tunnel, see eval/profile.py):

- ``flow step (build+solve)``: one streaming flow step on carried
  pyramids (``lucas_kanade_pyramidal_step``) — builds the NEW frame's
  pyramid and refines; the flow work the VO step actually does.
- ``pyramid build (1 frame)``: the build alone.
- ``seed_grid (Shi-Tomasi)``: the full-frame corner response +
  grid-cell argmax the keyframe reseed runs (every frame at
  keyframe_stride=1).
- ``advance (track gathers)``: dense-flow sampling + border cull of
  the track table.
- ``full VO step``: the whole ``FrontEnd._step`` (flow + advance +
  loss stats + reseed cond), the serving loop body.

Every stage body is arranged so its whole computation feeds the loop
carry (no DCE).
"""

from __future__ import annotations

import time

import numpy as np

from tpuflow.eval.profile import _marginal_seconds, _natural_pair


def profile_vo(
    height: int = 1080,
    width: int = 1920,
    config: str = "production",
    grid_step: int = 16,
    fb_check: float | None = None,
) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.flow.pyramidal import lucas_kanade_pyramidal_step
    from tpuflow.kernels import jnp_ref
    from tpuflow.vo import tracking
    from tpuflow.vo.device_loop import get_front_end

    cfg = PYRAMID_CONFIGS[config]
    backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    h, w = height, width

    f0, f1 = _natural_pair(h, w)
    frame0 = jnp.asarray(f0)
    frame1 = jnp.asarray(f1)
    pyr0 = tuple(
        jnp_ref.build_gaussian_pyramid(frame0, cfg.levels, cfg.scale_factor)
    )
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.uniform(-2, 2, (h, w)), jnp.float32)

    fe = get_front_end(
        grid_step=grid_step, keyframe_stride=1,
        fb_check_threshold=fb_check, backend=backend, config=cfg,
    )
    state0, _ = fe.init(frame0)
    jax.block_until_ready(state0.xy)
    tracks0 = tracking.Tracks(state0.xy, state0.start_xy, state0.age,
                              state0.alive)
    margin = fe.margin_for(h, w)

    def flow_step(x):
        u, v, _pyr = lucas_kanade_pyramidal_step(
            pyr0, x, cfg, backend=backend, rtl_clamp=True
        )
        return x + (u + v) * 1e-9

    def build(x):
        lvl = jnp_ref.build_gaussian_pyramid(x, cfg.levels, cfg.scale_factor)[0]
        return x + 1e-9 * jnp.pad(
            lvl, ((0, h - lvl.shape[0]), (0, w - lvl.shape[1]))
        )

    def seed(x):
        t = tracking.seed_grid(x, grid_step=grid_step,
                               margin=fe.margin_for(h, w, for_cull=False))
        return x + 1e-9 * (t.xy.sum() + t.alive.sum())

    def advance(x):
        t = tracking.advance(tracks0, u0, u0 + x * 1e-12, margin=margin)
        return x + 1e-9 * (t.xy.sum() + t.age.sum())

    def full_step(x):
        st, _obs = fe._step(state0, x)
        keep = (
            st.xy.sum() + st.age.sum()
            + st.loss_count.astype(jnp.float32)
            + st.n_landmarks.astype(jnp.float32)
            + st.carry[0].sum()
        )
        return x + 1e-9 * keep

    stages = [
        ("flow step (build+solve)", flow_step),
        ("pyramid build (1 frame)", build),
        ("seed_grid (Shi-Tomasi)", seed),
        ("advance (track gathers)", advance),
        ("full VO step", full_step),
    ]
    rows = []
    for name, fn in stages:
        t = _marginal_seconds(fn, (h, w), x0=f1)
        rows.append({"stage": name, "ms": t * 1e3})
    # Accounting row: the gap the component stages don't explain.
    comp = {r["stage"]: r["ms"] for r in rows}
    explained = (
        comp["flow step (build+solve)"]
        + comp["seed_grid (Shi-Tomasi)"]
        + comp["advance (track gathers)"]
    )
    rows.append({
        "stage": "unexplained (full - flow - seed - advance)",
        "ms": comp["full VO step"] - explained,
    })
    return rows


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Per-stage profile of the VO serving step"
    )
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--config", type=str, default="production")
    parser.add_argument("--grid-step", type=int, default=16)
    parser.add_argument("--fb-check", type=float, default=None)
    parser.add_argument("--json", type=str, default=None, metavar="PATH")
    args = parser.parse_args()

    rows = profile_vo(args.height, args.width, args.config,
                      args.grid_step, args.fb_check)
    print(f"VO serving profile @ {args.width}x{args.height} "
          f"config={args.config} fb={args.fb_check}")
    for r in rows:
        print(f"  {r['stage']:42s} {r['ms']:8.3f} ms")
    if args.json:
        import json
        import platform
        from datetime import datetime, timezone
        from pathlib import Path

        doc = {
            "timestamp": datetime.now(timezone.utc).isoformat(),
            "height": args.height,
            "width": args.width,
            "config": args.config,
            "grid_step": args.grid_step,
            "fb_check": args.fb_check,
            "host": platform.node(),
            "stages": rows,
        }
        path = Path(args.json)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(doc, indent=2))
        print(f"profile snapshot -> {path}")


if __name__ == "__main__":
    main()
