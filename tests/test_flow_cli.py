"""Frame-pair flow CLI (python -m tpuflow.flow) — the reference's
single-scale/pyramidal driver scripts (lucas_kanade_reference.py main,
lucas_kanade_pyramidal.py main)."""

import sys

import numpy as np
import pytest

from tpuflow.eval import patterns
from tpuflow.io import frames as fio


@pytest.fixture(scope="module")
def pattern_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_suite")
    patterns.generate_test_pattern(
        patterns.TEST_PATTERNS["translate_medium"],
        output_dir=d,
        save_png=False,
    )
    return d / "translate_medium"


def run_cli(argv, capsys):
    from cli_harness import run_cli_main

    from tpuflow.flow.__main__ import main

    return run_cli_main(main, argv, capsys)


def test_cli_single_scale_stats_and_export(pattern_dir, tmp_path, capsys):
    dump = tmp_path / "flow.txt"
    out = run_cli([str(pattern_dir), "--export", str(dump)], capsys)
    assert "single-scale" in out
    assert "mean_u" in out
    u, v = fio.load_flow_text(dump)
    assert u.shape == (240, 320)
    # 2 px rightward motion: positive mean u in the textured region,
    # same direction the reference's TB asserts (tb_optical_flow_top.sv).
    assert u[105:135, 55:85].mean() > 0.5
    assert abs(v[105:135, 55:85].mean()) < 0.5


def test_cli_pyramidal_compare(pattern_dir, tmp_path, capsys):
    dump = tmp_path / "single.txt"
    run_cli([str(pattern_dir), "--export", str(dump)], capsys)
    out = run_cli(
        [str(pattern_dir), "--pyramidal", "--compare", str(dump)], capsys
    )
    assert "pyramidal[default]" in out
    assert "mae_u=" in out


def test_cli_missing_frames(tmp_path, capsys):
    with pytest.raises(SystemExit) as e:
        run_cli([str(tmp_path)], capsys)
    assert e.value.code == 1


def test_cli_sequence_streaming(tmp_path, capsys):
    """--sequence streams a frame series through one jitted program via
    FrameStream and reports throughput."""
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns
    from tpuflow.io import frames as fio

    base = patterns.load_base_texture(160, 120).astype(np.float32)
    for i in range(4):
        f = nd_shift(base, (0.0, 2.0 * i), order=1, mode="nearest")
        fio.save_frame_bin(tmp_path / f"frame_{i:02d}.bin", f)

    out = run_cli(
        [str(tmp_path), "--sequence", "--width", "160", "--height", "120"],
        capsys,
    )
    assert "pairs: 3" in out
    assert "throughput:" in out
    # 2 px/frame shift: mean magnitude across the frame is positive and
    # bounded by the true motion.
    mag = float(out.split("mean flow magnitude:")[1].split("px")[0])
    assert 0.3 < mag < 3.0


def test_cli_sequence_too_few_frames(tmp_path, capsys):
    with pytest.raises(SystemExit):
        run_cli([str(tmp_path), "--sequence"], capsys)


def test_cli_rtl_backend(pattern_dir, tmp_path, capsys):
    """--backend rtl: the S8.7 integer datapath (the reference RTL
    sim's flow_field_rtl.txt analog) runs from the same CLI and
    underestimates like the hardware (README.md:386-395: ~0.76 vs 2.0
    GT on the 2 px translate test region)."""
    dump = tmp_path / "flow_field_rtl.txt"
    out = run_cli(
        [str(pattern_dir), "--backend", "rtl", "--export", str(dump)],
        capsys,
    )
    assert "S8.7 RTL" in out
    mean_u = float(out.split("mean_u")[1].split("\n")[0])
    assert 0.3 < mean_u < 1.6, out  # hardware-style underestimate
    assert dump.exists()


def test_cli_rtl_rejects_pyramidal(pattern_dir, capsys):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        run_cli([str(pattern_dir), "--backend", "rtl", "--pyramidal"], capsys)
