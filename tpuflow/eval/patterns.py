"""Synthetic test-pattern generation with analytically known ground truth.

Re-creation of the reference test-suite generator (reference:
python/generate_test_suite.py:57-335): the same 13 named motion patterns
applied to the same CC BY-SA 3.0 mountain texture (photo by Hannes Röst,
Wikimedia Commons — asset shipped in tpuflow/eval/data/) via the same
OpenCV affine warp (center-pivot rotation/scale + translation, bilinear,
gray-128 border). Frame pairs are bit-identical to the reference suite,
which is what makes the committed accuracy baselines transferable.

OpenCV is a *harness* dependency only — nothing in the device compute
path imports it.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

DATA_DIR = Path(__file__).parent / "data"
DEFAULT_TEXTURE = DATA_DIR / "mountain_texture.jpg"
DEFAULT_SUITE_DIR = Path(__file__).resolve().parents[2] / "test_suite"


@dataclasses.dataclass
class MotionParameters:
    """Ground-truth motion for one pattern (reference:
    generate_test_suite.py:40-53)."""

    name: str
    dx: float = 0.0
    dy: float = 0.0
    rotation: float = 0.0  # degrees CCW
    scale: float = 1.0
    description: str = ""

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# The 13 patterns of the reference suite (generate_test_suite.py:57-137).
TEST_PATTERNS: Dict[str, MotionParameters] = {
    "translate_small": MotionParameters(
        "translate_small", dx=0.5, dy=0.5,
        description="Half-pixel shift exercising sub-pixel precision"),
    "translate_medium": MotionParameters(
        "translate_medium", dx=2.0,
        description="2 px horizontal shift, the canonical in-window case"),
    "translate_large": MotionParameters(
        "translate_large", dx=15.0,
        description="15 px shift, beyond single-scale LK's window reach"),
    "translate_vertical": MotionParameters(
        "translate_vertical", dy=10.0,
        description="Pure 10 px vertical shift"),
    "translate_diagonal": MotionParameters(
        "translate_diagonal", dx=10.0, dy=10.0,
        description="Equal 10 px shift on both axes"),
    "rotate_small": MotionParameters(
        "rotate_small", rotation=2.0,
        description="2 deg rotation, mildly breaking brightness constancy"),
    "rotate_medium": MotionParameters(
        "rotate_medium", rotation=5.0,
        description="5 deg rotation probing the algorithm's envelope"),
    "rotate_large": MotionParameters(
        "rotate_large", rotation=15.0,
        description="15 deg rotation, a documented LK failure mode"),
    "zoom_in": MotionParameters(
        "zoom_in", scale=1.1,
        description="Radial expansion by 10%"),
    "zoom_out": MotionParameters(
        "zoom_out", scale=0.9,
        description="Radial contraction by 10%"),
    "translate_rotate": MotionParameters(
        "translate_rotate", dx=5.0, dy=5.0, rotation=3.0,
        description="5 px shift composed with a 3 deg rotation"),
    "no_motion": MotionParameters(
        "no_motion",
        description="Identical frames; the flow must be exactly zero"),
    "translate_extreme": MotionParameters(
        "translate_extreme", dx=30.0, dy=20.0,
        description="30/20 px shift, far outside every pyramid budget"),
}


def load_base_texture(
    width: int = 320, height: int = 240, texture_path: Optional[Path] = None
) -> np.ndarray:
    """Grayscale uint8 base frame, bilinear-resized from the texture asset
    (reference: generate_test_suite.py:140-162)."""
    from PIL import Image

    path = texture_path or DEFAULT_TEXTURE
    if not path.exists():
        raise FileNotFoundError(f"Base texture not found: {path}")
    img = Image.open(path).convert("L")
    img = img.resize((width, height), Image.Resampling.BILINEAR)
    return np.array(img, dtype=np.uint8)


def apply_motion(frame: np.ndarray, params: MotionParameters) -> np.ndarray:
    """Affine warp with the reference's exact construction (reference:
    generate_test_suite.py:165-204): center-pivot rotation+scale matrix,
    translation added to the matrix's last column, bilinear interpolation,
    constant gray-128 border."""
    import cv2

    height, width = frame.shape
    center = (width / 2.0, height / 2.0)
    m = cv2.getRotationMatrix2D(center, params.rotation, params.scale)
    m[0, 2] += params.dx
    m[1, 2] += params.dy
    warped = cv2.warpAffine(
        frame,
        m,
        (width, height),
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=128,
    )
    return warped.astype(np.uint8)


def dense_ground_truth(
    params: MotionParameters, width: int = 320, height: int = 240
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-pixel analytic ground-truth flow for an affine pattern.

    The suite's scalar (dx, dy) ground truth is only exact for pure
    translations; rotation/zoom/combined patterns have spatially varying
    flow (which is why the reference scores them on a center crop,
    optical_flow_verifier.py:96-138). This computes the exact field:
    content at source pixel p lands at M(p) in the second frame
    (cv2.warpAffine maps ``dst(M(p)) = src(p)`` for the forward matrix),
    so ``flow(p) = M(p) - p`` with the same center-pivot matrix
    construction as :func:`apply_motion` (getRotationMatrix2D semantics:
    alpha = s*cos(a), beta = s*sin(a), computed directly in NumPy).

    Returns (u, v, visible): visible marks source pixels whose
    destination stays inside the frame (content observable in frame 1).
    """
    a = np.deg2rad(params.rotation)
    alpha = params.scale * np.cos(a)
    beta = params.scale * np.sin(a)
    cx, cy = width / 2.0, height / 2.0
    m02 = (1.0 - alpha) * cx - beta * cy + params.dx
    m12 = beta * cx + (1.0 - alpha) * cy + params.dy
    x = np.arange(width, dtype=np.float64)[None, :]
    y = np.arange(height, dtype=np.float64)[:, None]
    xd = alpha * x + beta * y + m02
    yd = -beta * x + alpha * y + m12
    u = (xd - x).astype(np.float32)
    v = (yd - y).astype(np.float32)
    visible = (
        (xd >= 0.0) & (xd <= width - 1.0)
        & (yd >= 0.0) & (yd <= height - 1.0)
    )
    return u, v, visible


def generate_test_pattern(
    params: MotionParameters,
    width: int = 320,
    height: int = 240,
    output_dir: Optional[Path] = None,
    save_mem: bool = True,
    save_bin: bool = True,
    save_png: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate one frame pair (+ optional artifacts on disk).

    Artifact layout matches the reference so external tools interoperate
    (reference: generate_test_suite.py:207-288): frame_00/01.bin (raw u8),
    frame_00/01.mem ($readmemh hex), metadata.json with ground truth.
    """
    frame_0 = load_base_texture(width, height)
    frame_1 = apply_motion(frame_0, params)

    if output_dir is not None:
        pattern_dir = Path(output_dir) / params.name
        pattern_dir.mkdir(parents=True, exist_ok=True)

        is_pure_translation = params.rotation == 0 and params.scale == 1.0
        metadata = {
            "pattern_name": params.name,
            "description": params.description,
            "resolution": {"width": width, "height": height},
            "motion_parameters": params.to_dict(),
            "expected_flow": {
                "u_mean": params.dx if is_pure_translation else "variable",
                "v_mean": params.dy if is_pure_translation else "variable",
                "note": "For rotation/zoom, flow varies spatially. Use test regions.",
            },
        }
        (pattern_dir / "metadata.json").write_text(json.dumps(metadata, indent=2))

        if save_bin:
            frame_0.tofile(pattern_dir / "frame_00.bin")
            frame_1.tofile(pattern_dir / "frame_01.bin")
        if save_mem:
            for name, frame in (("frame_00.mem", frame_0), ("frame_01.mem", frame_1)):
                with open(pattern_dir / name, "w") as f:
                    f.writelines(f"{val:02x}\n" for val in frame.flatten())
        if save_png:
            from PIL import Image

            Image.fromarray(frame_0).save(pattern_dir / "frame_00.png")
            Image.fromarray(frame_1).save(pattern_dir / "frame_01.png")

    return frame_0, frame_1


def generate_full_suite(
    width: int = 320,
    height: int = 240,
    output_dir: Optional[Path] = None,
    save_png: bool = False,
) -> Path:
    """Generate all 13 patterns plus the suite_index.json manifest
    (reference: generate_test_suite.py:291-335). Returns the suite dir."""
    out = Path(output_dir) if output_dir else DEFAULT_SUITE_DIR
    out.mkdir(parents=True, exist_ok=True)

    for params in TEST_PATTERNS.values():
        generate_test_pattern(params, width, height, out, save_png=save_png)

    suite_index = {
        "suite_name": "Optical Flow Verification Suite",
        "resolution": {"width": width, "height": height},
        "num_patterns": len(TEST_PATTERNS),
        "patterns": {n: p.to_dict() for n, p in TEST_PATTERNS.items()},
    }
    (out / "suite_index.json").write_text(json.dumps(suite_index, indent=2))
    return out


def load_test_pattern(pattern_dir: Path) -> Dict[str, Any]:
    """Load a generated pattern: float32 frames + metadata (reference:
    optical_flow_verifier.py:43-71)."""
    pattern_dir = Path(pattern_dir)
    metadata = json.loads((pattern_dir / "metadata.json").read_text())
    width = metadata["resolution"]["width"]
    height = metadata["resolution"]["height"]
    prev = np.fromfile(pattern_dir / "frame_00.bin", dtype=np.uint8)
    curr = np.fromfile(pattern_dir / "frame_01.bin", dtype=np.uint8)
    return {
        "frame_prev": prev.reshape((height, width)).astype(np.float32),
        "frame_curr": curr.reshape((height, width)).astype(np.float32),
        "metadata": metadata,
    }


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Generate optical flow test patterns with known ground truth"
    )
    parser.add_argument("--pattern", type=str, default="all",
                        help='"all", a pattern name, or "custom"')
    parser.add_argument("--list", action="store_true", help="List available patterns")
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--png", action="store_true", help="Also save PNGs")
    parser.add_argument("--dx", type=float, default=0.0)
    parser.add_argument("--dy", type=float, default=0.0)
    parser.add_argument("--rotation", type=float, default=0.0)
    parser.add_argument("--scale", type=float, default=1.0)
    args = parser.parse_args()

    if args.list:
        for name, p in TEST_PATTERNS.items():
            print(f"{name:25s} - {p.description}")
        return

    out = Path(args.output_dir) if args.output_dir else DEFAULT_SUITE_DIR
    if args.pattern == "all":
        suite = generate_full_suite(args.width, args.height, out, save_png=args.png)
        print(f"Generated {len(TEST_PATTERNS)} patterns -> {suite}")
    elif args.pattern == "custom":
        params = MotionParameters(
            "custom", dx=args.dx, dy=args.dy, rotation=args.rotation, scale=args.scale,
            description=f"Custom: dx={args.dx}, dy={args.dy}, rot={args.rotation}°",
        )
        generate_test_pattern(params, args.width, args.height, out, save_png=args.png)
        print(f"Saved to: {out / 'custom'}")
    elif args.pattern in TEST_PATTERNS:
        generate_test_pattern(
            TEST_PATTERNS[args.pattern], args.width, args.height, out, save_png=args.png
        )
        print(f"Saved to: {out / args.pattern}")
    else:
        raise SystemExit(f"Unknown pattern '{args.pattern}' (use --list)")


if __name__ == "__main__":
    main()
