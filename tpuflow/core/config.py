"""Pyramid / solver configuration.

Mirrors the named pyramid configurations of the reference verifier
(reference: python/verification_config.yaml:78-103) so that users of the
reference can select the same ``default / shallow / deep / large_window``
configs by name.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    """Static configuration for pyramidal Lucas-Kanade.

    All fields are static (Python ints/floats) so a config hashes cleanly
    into a jitted function's static arguments.
    """

    levels: int = 3
    window_size: int = 5
    iterations: int = 3
    scale_factor: float = 0.5
    # Early-exit threshold on the mean |residual| per component
    # (reference: python/lucas_kanade_pyramidal.py:221-223).
    convergence_threshold: float = 0.01
    # Texture gate on the structure-tensor determinant
    # (reference: python/lucas_kanade_core.py:131).
    det_threshold: float = 1e-4
    # Fast-path (backend="pallas") per-level flow saturation in pixels —
    # the analog of the RTL's S8.7 +-8 px solver clamp
    # (rtl/unopt/flow_solver.sv:134-144). Inactive for motions within the
    # band, where the fast path matches the parity path exactly. The jnp
    # parity path never clamps (golden-model semantics).
    max_disp: int = 8
    # Optional narrower *vertical* saturation band for the fast path.
    # The banded warp kernel's candidate-row gather loop (the frame-time
    # hot spot at 1080p) runs 2*max_disp_v + 2 gather pairs, so a narrow
    # vertical band cuts warp time roughly linearly. The warp/refine
    # kernels saturate carried vertical flow at +-max_disp_v (like the
    # RTL's clamp, but asymmetric); for horizontally-dominant motion
    # this clamps only untextured-region LK noise, which measured
    # *slightly better* suite metrics (the clamp regularizes garbage
    # vectors). None = max_disp (full parity-band behavior).
    max_disp_v: int | None = None
    description: str = ""

    @property
    def max_disp_v_effective(self) -> int:
        return self.max_disp if self.max_disp_v is None else self.max_disp_v


# Named configurations, mirroring verification_config.yaml:78-103.
PYRAMID_CONFIGS: dict[str, PyramidConfig] = {
    "default": PyramidConfig(
        levels=3, window_size=5, iterations=3,
        description="3-level pyramid, 5x5 window, 3 iterations/level",
    ),
    "shallow": PyramidConfig(
        levels=2, window_size=5, iterations=3,
        description="2-level pyramid (faster, less memory)",
    ),
    "deep": PyramidConfig(
        levels=4, window_size=5, iterations=3,
        description="4-level pyramid (handles larger motion)",
    ),
    "large_window": PyramidConfig(
        levels=3, window_size=7, iterations=3,
        description="3-level pyramid, 7x7 window",
    ),
    # Production fast-path config for horizontally-dominant motion
    # (vehicle-mounted / scanline cameras): vertical saturation band
    # narrowed to +-3 px, halving the banded-warp gather loop. Accuracy
    # impact is confined to patterns with |v| > 3 (see
    # docs/verification_results_pallas.md narrow-band column).
    "narrow_vertical": PyramidConfig(
        levels=3, window_size=5, iterations=3, max_disp_v=3,
        description="3-level pyramid, vertical flow band narrowed to +-3 px",
    ),
}
