"""Natural-texture frame-pair generator (single pair, sub-pixel motion).

Re-creation of the reference's RTL-sim frame generator (reference:
python/generate_test_frames_natural.py:31-73): mountain texture resized
with PIL's default (bicubic) resampling — note this intentionally
differs from the suite generator's bilinear resize — or a sinusoid-sum
synthetic fallback, shifted sub-pixel with ``scipy.ndimage.shift``
(order=1, constant gray-128 fill). Frames are bit-identical to the
reference's, which makes the fixed-point RTL-parity numbers comparable
(README.md:386-395).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tpuflow.eval.patterns import DEFAULT_TEXTURE


def generate_natural_pattern(width: int = 320, height: int = 240) -> np.ndarray:
    """Grayscale u8 base frame from the mountain texture (PIL default
    resampling, matching generate_test_frames_natural.py:41)."""
    from PIL import Image

    img = Image.open(DEFAULT_TEXTURE).convert("L")
    img = Image.fromarray(np.array(img, dtype=np.uint8)).resize((width, height))
    return np.array(img, dtype=np.uint8)


def generate_smooth_synthetic(width: int, height: int) -> np.ndarray:
    """Sum-of-sinusoids texture (reference fallback,
    generate_test_frames_natural.py:49-64)."""
    x = np.linspace(0, 4 * np.pi, width)
    y = np.linspace(0, 3 * np.pi, height)
    xx, yy = np.meshgrid(x, y)
    pattern = (
        128
        + 50 * np.sin(xx) * np.cos(yy)
        + 30 * np.cos(2 * xx + 0.5) * np.sin(1.5 * yy)
        + 20 * np.sin(3 * xx - 0.3) * np.cos(2.5 * yy + 0.7)
    )
    return np.clip(pattern, 0, 255).astype(np.uint8)


def apply_motion(frame: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Sub-pixel shift, bilinear, gray-128 fill (reference:
    generate_test_frames_natural.py:67-73)."""
    from scipy.ndimage import shift

    return shift(frame, (dy, dx), order=1, mode="constant", cval=128).astype(
        np.uint8
    )


def generate_pair(
    width: int = 320,
    height: int = 240,
    dx: float = 2.0,
    dy: float = 0.0,
    synthetic: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    base = (
        generate_smooth_synthetic(width, height)
        if synthetic
        else generate_natural_pattern(width, height)
    )
    return base, apply_motion(base, dx, dy)


def main() -> None:
    import argparse

    from tpuflow.io import save_frame_bin, save_frame_mem

    parser = argparse.ArgumentParser(description="Generate a natural frame pair")
    parser.add_argument("--displacement-x", type=float, default=2.0)
    parser.add_argument("--displacement-y", type=float, default=0.0)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--output-dir", type=str, default="test_frames")
    parser.add_argument("--use-synthetic", action="store_true")
    args = parser.parse_args()

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    f0, f1 = generate_pair(
        args.width, args.height, args.displacement_x, args.displacement_y,
        synthetic=args.use_synthetic,
    )
    save_frame_bin(out / "frame_00.bin", f0)
    save_frame_bin(out / "frame_01.bin", f1)
    save_frame_mem(out / "frame_00.mem", f0)
    save_frame_mem(out / "frame_01.mem", f1)
    print(f"Saved frame pair -> {out} (motion {args.displacement_x}, "
          f"{args.displacement_y})")


if __name__ == "__main__":
    main()
