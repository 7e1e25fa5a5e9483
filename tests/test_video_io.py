"""Video-container ingestion (tpuflow.io.video) + CLI video modes.

Gated on the local OpenCV build having a working mp4 encoder (the
decoder path is what ships in the package; the encoder is only used to
synthesize the test clip)."""

import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    from scipy.ndimage import shift as nd_shift

    from tpuflow.eval import patterns

    w, h = 320, 120
    base = patterns.load_base_texture(w, h).astype(np.float32)
    p = tmp_path_factory.mktemp("video") / "seq.mp4"
    writer = cv2.VideoWriter(
        str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h), False
    )
    if not writer.isOpened():
        pytest.skip("cv2 build lacks an mp4 encoder")
    for i in range(8):
        f = nd_shift(base, (0.0, -1.5 * i), order=1, mode="nearest")
        writer.write(np.clip(f, 0, 255).astype(np.uint8))
    writer.release()
    return p


def test_stream_frames_and_pairs(video_path):
    from tpuflow.io.video import VideoFrameStream

    s = VideoFrameStream(str(video_path))
    frames = s.read_all()
    assert len(frames) == 8
    assert frames[0].shape == (120, 320)
    assert frames[0].dtype == np.float32
    assert len(list(s.pairs())) == 7
    # mp4 is lossy; the inter-frame shift must still dominate: mean
    # abs difference between consecutive frames well above codec noise.
    d01 = np.abs(frames[1] - frames[0]).mean()
    assert d01 > 1.0


def test_stream_resize_and_cap(video_path):
    from tpuflow.io.video import VideoFrameStream

    s = VideoFrameStream(str(video_path), size=(160, 60), max_frames=3)
    frames = s.read_all()
    assert len(frames) == 3
    assert frames[0].shape == (60, 160)


def test_missing_file_raises(tmp_path):
    from tpuflow.io.video import VideoFrameStream

    with pytest.raises(IOError):
        VideoFrameStream(str(tmp_path / "nope.mp4"))


def test_flow_cli_video_sequence(video_path, capsys):
    from cli_harness import run_cli_main

    from tpuflow.flow.__main__ import main

    out = run_cli_main(main, [str(video_path), "--pyramidal"], capsys)
    assert "video seq.mp4" in out
    assert "pairs: 7" in out
    # 1.5 px/frame rightward shift: recovered mean magnitude nearby.
    mag = float(out.split("mean flow magnitude:")[1].split("px")[0])
    assert 0.8 < mag < 2.5, out


def test_vo_cli_video(video_path, capsys):
    from cli_harness import run_cli_main

    from tpuflow.vo.__main__ import main

    out = run_cli_main(
        main,
        [str(video_path), "--max-frames", "6",
         "--intrinsics", "150", "150", "160", "60"],
        capsys,
    )
    assert "keyframes: 6" in out
