"""VO CLI (python -m tpuflow.vo) — frames in, KITTI poses + trajectory
plot out, with checkpoint/resume and the chunked pose-graph mode."""

import sys

import numpy as np
import pytest

from tpuflow.io import frames as fio


@pytest.fixture(scope="module")
def vo_frame_dir(tmp_path_factory):
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns

    d = tmp_path_factory.mktemp("vo_cli_frames")
    w, h = 320, 120
    base = patterns.load_base_texture(w, h).astype(np.float32)
    for i in range(8):
        fio.save_frame_bin(
            d / f"frame_{i:02d}.bin",
            nd_shift(base, (0.0, -1.2 * i), order=1, mode="nearest"),
        )
    return d


def run_cli(argv, capsys):
    from cli_harness import run_cli_main

    from tpuflow.vo.__main__ import main

    return run_cli_main(main, argv, capsys)


def _base_argv(d):
    return [str(d), "--width", "320", "--height", "120",
            "--intrinsics", "150", "150", "160", "60"]


def test_incremental_export_and_checkpoint(vo_frame_dir, tmp_path, capsys):
    poses = tmp_path / "poses.txt"
    ckpt = tmp_path / "ckpt"
    out = run_cli(
        _base_argv(vo_frame_dir)
        + ["--export-poses", str(poses), "--checkpoint", str(ckpt)],
        capsys,
    )
    assert "keyframes: 8" in out
    assert "reprojection error" in out
    # KITTI format: 12 floats per keyframe line; first pose = identity.
    rows = np.loadtxt(poses)
    assert rows.shape == (8, 12)
    np.testing.assert_allclose(
        rows[0], np.eye(3, 4).ravel(), atol=1e-6
    )
    # Forward translation dominates: c2w x-positions increase.
    x = rows[:, 3]
    assert x[-1] > x[1] > 0 or x[-1] < x[1] < 0

    # Resume the checkpoint and keep going.
    out2 = run_cli(
        _base_argv(vo_frame_dir) + ["--resume", str(ckpt)], capsys
    )
    assert "resumed session at frame 7" in out2
    assert "keyframes: 16" in out2


def test_chunked_mode(vo_frame_dir, capsys):
    out = run_cli(
        _base_argv(vo_frame_dir) + ["--chunked", "--chunk-size", "5"],
        capsys,
    )
    assert "keyframes: 8" in out


def test_missing_frames_errors(tmp_path, capsys):
    with pytest.raises(SystemExit):
        run_cli([str(tmp_path)], capsys)


def test_resume_rejects_constructor_flags(vo_frame_dir, tmp_path, capsys):
    """Session-constructor flags are loaded from the checkpoint meta on
    --resume; passing a conflicting value must error, not be silently
    overridden (code-review r2 finding)."""
    ckpt = tmp_path / "ckpt"
    run_cli(_base_argv(vo_frame_dir) + ["--checkpoint", str(ckpt)], capsys)
    for flags in (
        ["--backend", "pallas"],
        ["--keyframe-stride", "2"],
        ["--grid-step", "32"],
        ["--init-depth", "2.0"],
        ["--fb-check", "1.0"],
        ["--pyramid-config", "shallow"],
    ):
        with pytest.raises(SystemExit) as exc:
            run_cli(
                _base_argv(vo_frame_dir) + ["--resume", str(ckpt)] + flags,
                capsys,
            )
        assert exc.value.code == 2, flags
        assert "--resume" in capsys.readouterr().err


def test_chunked_only_flags_rejected_without_chunked(vo_frame_dir, capsys):
    for flags in (
        ["--loop-closure"],
        ["--chunk-size", "4"],
        ["--motion-prior", "0.5"],
    ):
        with pytest.raises(SystemExit) as exc:
            run_cli(_base_argv(vo_frame_dir) + flags, capsys)
        assert exc.value.code == 2, flags
        assert "--chunked" in capsys.readouterr().err
