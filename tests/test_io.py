"""IO round-trip tests for the reference interchange formats."""

import numpy as np

from tpuflow.io import frames


def test_bin_roundtrip(tmp_path, rng):
    f = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    p = tmp_path / "frame.bin"
    frames.save_frame_bin(p, f)
    back = frames.load_frame_bin(p, width=32, height=24)
    np.testing.assert_array_equal(back, f.astype(np.float32))


def test_mem_roundtrip(tmp_path, rng):
    f = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    p = tmp_path / "frame.mem"
    frames.save_frame_mem(p, f)
    # Format: one lowercase 2-hex-digit byte per line ($readmemh).
    lines = p.read_text().splitlines()
    assert len(lines) == 24 * 32
    assert all(len(l) == 2 for l in lines)
    back = frames.load_frame_mem(p, width=32, height=24)
    np.testing.assert_array_equal(back, f.astype(np.float32))


def test_flow_text_roundtrip(tmp_path, rng):
    u = rng.normal(0, 2, (10, 14)).astype(np.float32)
    v = rng.normal(0, 2, (10, 14)).astype(np.float32)
    p = tmp_path / "flow.txt"
    frames.save_flow_text(p, u, v, header="tpuflow test dump")
    u2, v2 = frames.load_flow_text(p)
    np.testing.assert_allclose(u2, u, atol=1e-5)
    np.testing.assert_allclose(v2, v, atol=1e-5)


def test_flow_text_reads_reference_style(tmp_path):
    # The RTL testbench writes integer-ish lines with comments
    # (tb_optical_flow_top.sv:334-363 style).
    p = tmp_path / "flow_rtl.txt"
    p.write_text("// RTL flow dump\n# x y u v\n0 0 0.5 -0.25\n1 0 1.0 0.0\n0 1 0 0\n1 1 2 1\n")
    u, v = frames.load_flow_text(p)
    assert u.shape == (2, 2)
    assert u[0, 1] == 1.0 and v[0, 0] == -0.25


def test_visualize_diagnostic(tmp_path, rng):
    from tpuflow.eval import visualize

    u = rng.normal(1, 0.5, (40, 60)).astype(np.float32)
    v = rng.normal(0, 0.5, (40, 60)).astype(np.float32)
    out = tmp_path / "diag.png"
    visualize.diagnostic_panel(u, v, out, compare_uv=(u * 0.9, v))
    assert out.exists() and out.stat().st_size > 1000


def test_device_pairs_matches_host_pairs(tmp_path):
    """The double-buffered H2D path (io.stream.device_pairs) must be a
    pure transport change: same pair ordering and bit-identical values
    as the host-side pairs() iterator, every frame uploaded once."""
    import jax
    import numpy as np

    from tpuflow.io import frames as fio
    from tpuflow.io.stream import FrameStream, device_pairs

    rng = np.random.default_rng(5)
    paths = []
    for i in range(5):
        f = rng.uniform(0, 255, (24, 32)).astype(np.float32)
        p = tmp_path / f"frame_{i:02d}.bin"
        fio.save_frame_bin(p, f)
        paths.append(p)

    stream = FrameStream(paths, width=32, height=24)
    host = list(FrameStream(paths, width=32, height=24).pairs())
    dev = list(device_pairs(stream, lookahead=2))
    assert len(dev) == len(host) == 4
    for (hp, hc), (dp, dc) in zip(host, dev):
        assert isinstance(dp, jax.Array) and isinstance(dc, jax.Array)
        np.testing.assert_array_equal(np.asarray(dp), hp)
        np.testing.assert_array_equal(np.asarray(dc), hc)
    # Consecutive pairs share the middle frame's single upload.
    for (_, c0), (p1, _) in zip(dev, dev[1:]):
        assert c0 is p1
