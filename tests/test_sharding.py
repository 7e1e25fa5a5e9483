"""Multi-chip sharding tests on a virtual 8-device CPU mesh (the analog
of the reference testing RTL without a board — SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuflow.flow import lucas_kanade_single_scale
from tpuflow.sharding import make_flow_mesh, tiled_lucas_kanade_single_scale
from tpuflow.sharding.halo import exchange_halo_2d


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_mesh_construction():
    _need(8)
    mesh = make_flow_mesh(batch=2, ty=2, tx=2)
    assert mesh.shape == {"batch": 2, "ty": 2, "tx": 2}
    with pytest.raises(ValueError):
        make_flow_mesh(batch=4, ty=2, tx=2)


def test_halo_exchange_matches_padding():
    """Halo-extended tiles reassemble into the symmetrically padded image."""
    _need(4)
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    import functools

    mesh = make_flow_mesh(batch=1, ty=2, tx=2)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 16, 24)).astype(np.float32)
    halo = 3

    spec = P("batch", "ty", "tx")

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=P("batch", "ty", "tx")
    )
    def extend(x):
        return jax.vmap(
            lambda t: exchange_halo_2d(t, halo, ty=2, tx=2, boundary="symm")
        )(x)

    x = jax.device_put(jnp.asarray(img), NamedSharding(mesh, spec))
    ext = jax.jit(extend)(x)
    # Each extended tile must equal the corresponding slice of the padded
    # global image.
    padded = np.pad(img[0], halo, mode="symmetric")
    ext_np = np.asarray(ext)
    # out_specs concatenates tiles: shape (1, 2*(8+6), 2*(12+6))
    t00 = ext_np[0, : 8 + 2 * halo, : 12 + 2 * halo]
    np.testing.assert_allclose(t00, padded[: 8 + 2 * halo, : 12 + 2 * halo], atol=0)
    t11 = ext_np[0, 8 + 2 * halo :, 12 + 2 * halo :]
    np.testing.assert_allclose(t11, padded[8:, 12:], atol=0)


@pytest.mark.parametrize("tiling", [(1, 2, 2), (2, 2, 2), (1, 4, 2), (1, 1, 8)])
def test_tiled_lk_matches_single_device(tiling, rng):
    """The headline sharding gate: tiled flow == single-device flow."""
    batch, ty, tx = tiling
    _need(batch * ty * tx)
    from scipy.ndimage import gaussian_filter

    mesh = make_flow_mesh(batch=batch, ty=ty, tx=tx)
    frames = []
    for _ in range(batch):
        p = gaussian_filter(
            rng.uniform(0, 255, (48, 64)).astype(np.float32), 2.0
        ).astype(np.float32)
        c = gaussian_filter(
            rng.uniform(0, 255, (48, 64)).astype(np.float32), 2.0
        ).astype(np.float32)
        frames.append((p, c))
    prev = jnp.asarray(np.stack([f[0] for f in frames]))
    curr = jnp.asarray(np.stack([f[1] for f in frames]))

    u_t, v_t = tiled_lucas_kanade_single_scale(prev, curr, mesh)

    for b in range(batch):
        u_s, v_s = lucas_kanade_single_scale(prev[b], curr[b])
        np.testing.assert_allclose(
            np.asarray(u_t)[b], np.asarray(u_s), atol=1e-4,
            err_msg=f"tiling {tiling} batch {b} (u)",
        )
        np.testing.assert_allclose(
            np.asarray(v_t)[b], np.asarray(v_s), atol=1e-4,
            err_msg=f"tiling {tiling} batch {b} (v)",
        )


def test_tiled_lk_rejects_bad_tiling(rng):
    _need(4)
    mesh = make_flow_mesh(batch=1, ty=2, tx=2)
    prev = jnp.zeros((1, 48, 63), jnp.float32)  # width does not divide tx=2
    with pytest.raises(AssertionError):
        tiled_lucas_kanade_single_scale(prev, prev, mesh)


@pytest.mark.parametrize("tiling", [(1, 2, 2), (2, 2, 2)])
def test_tiled_pyramidal_matches_single_device(tiling, rng):
    """Tiled pyramidal (replicated coarse + sharded fine) == the
    single-device fast-path semantics (rtl_clamp)."""
    from tpuflow.flow import lucas_kanade_pyramidal
    from tpuflow.core.config import PyramidConfig
    from tpuflow.sharding.tiled_pyramidal import tiled_lucas_kanade_pyramidal
    from scipy.ndimage import gaussian_filter, shift

    batch, ty, tx = tiling
    _need(batch * ty * tx)
    mesh = make_flow_mesh(batch=batch, ty=ty, tx=tx)
    cfg = PyramidConfig(levels=3, window_size=5, iterations=2)

    frames = []
    for i in range(batch):
        base = gaussian_filter(
            rng.uniform(0, 255, (48, 64)).astype(np.float32), 2.0
        ).astype(np.float32)
        moved = shift(base, (0.5, 1.5 + i), order=1, mode="constant").astype(
            np.float32
        )
        frames.append((base, moved))
    prev = jnp.asarray(np.stack([f[0] for f in frames]))
    curr = jnp.asarray(np.stack([f[1] for f in frames]))

    u_t, v_t = tiled_lucas_kanade_pyramidal(prev, curr, mesh, config=cfg)

    # Tolerance note: the tiled warp evaluates bilinear coordinates in
    # tile-local frame (y_local + halo) vs the single-device global
    # frame; f32 rounding of the fractional parts differs at different
    # magnitudes, perturbing a fraction of a percent of pixels at the
    # ~2e-4 px level after the LK solve.
    for b in range(batch):
        u_s, v_s = lucas_kanade_pyramidal(
            prev[b], curr[b], config=cfg, rtl_clamp=True
        )
        np.testing.assert_allclose(
            np.asarray(u_t)[b], np.asarray(u_s), atol=1e-3,
            err_msg=f"tiling {tiling} batch {b}",
        )
        np.testing.assert_allclose(
            np.asarray(v_t)[b], np.asarray(v_s), atol=1e-3,
        )


def test_tiled_pallas_matches_single_pallas(rng):
    """backend="pallas" tiled flow (per-shard fused kernels + halo
    exchange) matches the single-device pallas fast path. Real-TPU only:
    pallas inside shard_map+vmap does not run in interpret mode."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("requires real TPU (pallas inside shard_map)")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpuflow.flow import lucas_kanade_pyramidal
    from tpuflow.sharding.tiled_pyramidal import tiled_lucas_kanade_pyramidal

    devs = np.array(jax.devices()[:1]).reshape(1, 1, 1)
    mesh = Mesh(devs, ("batch", "ty", "tx"))
    prev = jnp.asarray(rng.uniform(0, 255, (1, 120, 160)), jnp.float32)
    curr = jnp.roll(prev, 2, axis=2)
    u_t, v_t = tiled_lucas_kanade_pyramidal(prev, curr, mesh, backend="pallas")
    u_s, v_s = lucas_kanade_pyramidal(prev[0], curr[0], backend="pallas")
    np.testing.assert_allclose(np.asarray(u_t[0]), np.asarray(u_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_t[0]), np.asarray(v_s), atol=1e-3)
