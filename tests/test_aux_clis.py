"""Auxiliary CLI smoke tests: frame converter (scripts/convert_frames.py
analog) and the natural-frame generator (generate_test_frames_natural.py
analog) — the two harness CLIs not covered by the flow/VO CLI tests."""

import sys

import numpy as np
import pytest

from tpuflow.io import frames as fio


from cli_harness import run_cli_main as _run


def test_convert_bin_and_mem_to_png(tmp_path, rng, capsys):
    from PIL import Image

    from tpuflow.io.convert import main

    frame = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    b = tmp_path / "f.bin"
    m = tmp_path / "f.mem"
    fio.save_frame_bin(b, frame)
    fio.save_frame_mem(m, frame)
    _run(main, [str(b), str(m), "--width", "32", "--height", "24"], capsys)
    for stem in ("f.bin", "f.mem"):
        png = (tmp_path / stem).with_suffix(".png")
        assert png.exists()
    back = np.asarray(Image.open(tmp_path / "f.png").convert("L"))
    np.testing.assert_array_equal(back, frame)


def test_convert_rejects_unknown_format(tmp_path, capsys):
    from tpuflow.io.convert import main

    p = tmp_path / "f.xyz"
    p.write_bytes(b"\x00")
    with pytest.raises(SystemExit):
        _run(main, [str(p)], capsys)


def test_natural_generator_cli(tmp_path, capsys):
    """Deterministic subpixel-shifted frame pair in all three formats
    (the reference RTL-sim input generator, run_sim.sh:14 analog)."""
    from tpuflow.eval.natural import main

    out = tmp_path / "frames"
    _run(main, ["--displacement-x", "2", "--width", "64", "--height",
                "48", "--output-dir", str(out)], capsys)
    f0 = fio.load_frame_bin(out / "frame_00.bin", 64, 48)
    f1 = fio.load_frame_bin(out / "frame_01.bin", 64, 48)
    assert f0.shape == (48, 64)
    assert (out / "frame_00.mem").exists()
    assert (out / "frame_01.mem").exists()
    # 2 px rightward shift: frame_01 column c matches frame_00 c-2.
    np.testing.assert_allclose(
        f1[10:-10, 12:50], f0[10:-10, 10:48], atol=2.0
    )
