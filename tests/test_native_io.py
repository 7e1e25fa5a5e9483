"""Native IO runtime (tpuflow._fastio) tests — skipped when the C++
extension has not been built (python setup.py build_ext --inplace)."""

import numpy as np
import pytest

fastio = pytest.importorskip("tpuflow._fastio")


@pytest.fixture()
def frame(rng):
    return rng.integers(0, 256, (24, 32), dtype=np.uint8)


def test_mem_codec_roundtrip(tmp_path, frame):
    p = str(tmp_path / "f.mem")
    fastio.encode_mem(p, frame.tobytes())
    back = np.frombuffer(fastio.decode_mem(p), dtype=np.uint8)
    np.testing.assert_array_equal(back, frame.ravel())


def test_mem_codec_matches_python_io(tmp_path, frame):
    from tpuflow.io import frames as pyio

    p = tmp_path / "f.mem"
    pyio.save_frame_mem(p, frame)
    loaded = pyio.load_frame_mem(p, width=32, height=24)
    np.testing.assert_array_equal(loaded, frame.astype(np.float32))


def test_mem_decode_skips_comments(tmp_path):
    p = tmp_path / "c.mem"
    p.write_text("// header comment\nff\n00\n0a\n")
    vals = np.frombuffer(fastio.decode_mem(str(p)), dtype=np.uint8)
    np.testing.assert_array_equal(vals, [255, 0, 10])


def test_mem_decode_rejects_x_values(tmp_path):
    p = tmp_path / "x.mem"
    p.write_text("ff\nxx\n")
    with pytest.raises(ValueError):
        fastio.decode_mem(str(p))


def test_load_bin_f32(tmp_path, frame):
    p = tmp_path / "f.bin"
    frame.tofile(p)
    out = np.frombuffer(fastio.load_bin_f32(str(p)), dtype=np.float32)
    np.testing.assert_array_equal(out, frame.ravel().astype(np.float32))


def test_prefetcher_streams_in_order(tmp_path, frame):
    paths = []
    for i in range(5):
        p = tmp_path / f"s{i}.bin"
        ((frame + i) & 0xFF).astype(np.uint8).tofile(p)
        paths.append(str(p))
    pf = fastio.FramePrefetcher(paths, depth=2)
    for i in range(5):
        data = np.frombuffer(pf.next_frame(), dtype=np.float32)
        np.testing.assert_array_equal(
            data, (((frame + i) & 0xFF).ravel()).astype(np.float32)
        )
    assert pf.next_frame() is None
    pf.close()


def test_prefetcher_missing_file(tmp_path):
    pf = fastio.FramePrefetcher([str(tmp_path / "nope.bin")])
    with pytest.raises(OSError):
        pf.next_frame()
    pf.close()


def test_frame_stream_pairs(tmp_path, frame):
    from tpuflow.io.stream import FrameStream

    paths = []
    for i in range(4):
        p = tmp_path / f"s{i}.bin"
        ((frame + i) & 0xFF).astype(np.uint8).tofile(p)
        paths.append(p)
    stream = FrameStream(paths, width=32, height=24)
    pairs = list(stream.pairs())
    assert len(pairs) == 3
    np.testing.assert_array_equal(pairs[0][0], frame.astype(np.float32))
