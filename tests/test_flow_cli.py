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
    from tpuflow.flow.__main__ import main

    old = sys.argv
    sys.argv = ["tpuflow.flow"] + argv
    try:
        main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


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
