"""Pallas kernel equivalence tests (interpret mode on CPU — the analog of
the reference testing RTL without a board, SURVEY.md §4)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from tpuflow.kernels import jnp_ref, pallas_lk


def _jnp_lk(prev, curr, window=5):
    ix, iy, it = jnp_ref.compute_gradients(prev, curr)
    return jnp_ref.lucas_kanade_from_gradients(ix, iy, it, window_size=window)


@pytest.mark.parametrize("shape", [(48, 64), (240, 320), (56, 200)])
def test_fused_lk_matches_jnp(shape, rng):
    from scipy.ndimage import gaussian_filter

    prev = gaussian_filter(
        rng.uniform(0, 255, shape).astype(np.float32), 2.0
    ).astype(np.float32)
    curr = gaussian_filter(
        rng.uniform(0, 255, shape).astype(np.float32), 2.0
    ).astype(np.float32)
    ru, rv = _jnp_lk(jnp.asarray(prev), jnp.asarray(curr))
    with pltpu.force_tpu_interpret_mode():
        mu, mv = pallas_lk.lucas_kanade_fused(jnp.asarray(prev), jnp.asarray(curr))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ru), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(rv), atol=1e-3)


def test_fused_lk_multi_tile(rng):
    # Force several row tiles to exercise the halo DMA path.
    from scipy.ndimage import gaussian_filter

    prev = gaussian_filter(
        rng.uniform(0, 255, (96, 144)).astype(np.float32), 2.0
    ).astype(np.float32)
    curr = gaussian_filter(
        rng.uniform(0, 255, (96, 144)).astype(np.float32), 2.0
    ).astype(np.float32)
    ru, rv = _jnp_lk(jnp.asarray(prev), jnp.asarray(curr))
    with pltpu.force_tpu_interpret_mode():
        mu, mv = pallas_lk.lucas_kanade_fused(
            jnp.asarray(prev), jnp.asarray(curr), tile_rows=32
        )
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ru), atol=1e-3)


def test_fused_lk_ragged_height(rng):
    # Height not divisible by tile_rows: grid overhang rows are computed
    # on zero padding and trimmed.
    from scipy.ndimage import gaussian_filter

    prev = gaussian_filter(
        rng.uniform(0, 255, (52, 64)).astype(np.float32), 2.0
    ).astype(np.float32)
    curr = gaussian_filter(
        rng.uniform(0, 255, (52, 64)).astype(np.float32), 2.0
    ).astype(np.float32)
    ru, rv = _jnp_lk(jnp.asarray(prev), jnp.asarray(curr))
    with pltpu.force_tpu_interpret_mode():
        mu, mv = pallas_lk.lucas_kanade_fused(
            jnp.asarray(prev), jnp.asarray(curr), tile_rows=32
        )
    assert mu.shape == (52, 64)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ru), atol=1e-3)


def test_window_7_matches_jnp(rng):
    from scipy.ndimage import gaussian_filter

    prev = gaussian_filter(
        rng.uniform(0, 255, (48, 64)).astype(np.float32), 2.0
    ).astype(np.float32)
    curr = gaussian_filter(
        rng.uniform(0, 255, (48, 64)).astype(np.float32), 2.0
    ).astype(np.float32)
    ru, rv = _jnp_lk(jnp.asarray(prev), jnp.asarray(curr), window=7)
    with pltpu.force_tpu_interpret_mode():
        mu, mv = pallas_lk.lucas_kanade_fused(
            jnp.asarray(prev), jnp.asarray(curr), window_size=7
        )
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ru), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(rv), atol=1e-3)


def test_too_large_window_rejected():
    z = jnp.zeros((32, 32), jnp.float32)
    with pytest.raises(ValueError, match="window_size <= 7"):
        pallas_lk.lucas_kanade_fused(z, z, window_size=9)


def test_backend_dispatch(rng):
    from tpuflow.flow import lucas_kanade_single_scale

    prev = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        u, v = lucas_kanade_single_scale(
            jnp.asarray(prev), jnp.asarray(prev), backend="pallas"
        )
    assert np.all(np.asarray(u) == 0)


class TestBandedWarp:
    """Banded Pallas warp vs the jnp map_coordinates-parity warp."""

    def _pair(self, rng, h=56, w=200, umax=7.5, vmax=7.5):
        img = rng.uniform(0, 255, (h, w)).astype(np.float32)
        u = rng.uniform(-umax, umax, (h, w)).astype(np.float32)
        v = rng.uniform(-vmax, vmax, (h, w)).astype(np.float32)
        return img, u, v

    def test_matches_jnp_warp_in_band(self, rng):
        from tpuflow.kernels import pallas_warp

        img, u, v = self._pair(rng)
        ref = np.asarray(jnp_ref.warp_image(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), max_disp=8
                )
            )
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_wider_band_exact(self, rng):
        # A wider static band handles proportionally larger displacement.
        from tpuflow.kernels import pallas_warp

        img, u, v = self._pair(rng, umax=22.0, vmax=22.0)
        ref = np.asarray(jnp_ref.warp_image(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), max_disp=24
                )
            )
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_out_of_band_horizontal_saturates(self, rng):
        # |u| beyond the band samples at the band edge (documented fast-
        # mode semantics; the driver clamps flow before warping).
        from tpuflow.kernels import pallas_warp

        img = rng.uniform(1, 255, (48, 256)).astype(np.float32)
        u = np.full((48, 256), 20.0, np.float32)  # beyond max_disp=8
        z = np.zeros((48, 256), np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(z), max_disp=8
                )
            )
        # Saturated sample = value 8 px to the right (band edge).
        expected = np.asarray(
            jnp_ref.warp_image(jnp.asarray(img), jnp.asarray(z + 8.0), jnp.asarray(z))
        )
        interior = np.s_[:, : 256 - 21]
        np.testing.assert_allclose(got[interior], expected[interior], atol=1e-3)

    def test_out_of_band_vertical_reads_zero(self, rng):
        from tpuflow.kernels import pallas_warp

        img = rng.uniform(1, 255, (48, 128)).astype(np.float32)
        u = np.zeros((48, 128), np.float32)
        v = np.full((48, 128), 12.0, np.float32)  # beyond max_disp=8 band
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v), max_disp=8
                )
            )
        assert np.all(got == 0.0)

    def test_narrow_vertical_band_matches_in_band(self, rng):
        # max_disp_v < max_disp: exact for |v| <= max_disp_v, and the
        # smaller candidate loop must not perturb horizontal sampling.
        from tpuflow.kernels import pallas_warp

        img, u, v = self._pair(rng, umax=7.5, vmax=2.5)
        ref = np.asarray(
            jnp_ref.warp_image(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v))
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                    max_disp=8, max_disp_v=3,
                )
            )
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_narrow_vertical_clamp_saturates(self, rng):
        # clamp_flow=True + narrow vertical band: |v| beyond max_disp_v
        # saturates at the vertical band edge (asymmetric RTL clamp).
        from tpuflow.kernels import pallas_warp

        img = rng.uniform(1, 255, (48, 128)).astype(np.float32)
        z = np.zeros((48, 128), np.float32)
        v = np.full((48, 128), 6.0, np.float32)  # beyond max_disp_v=3
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(z), jnp.asarray(v),
                    max_disp=8, max_disp_v=3, clamp_flow=True,
                )
            )
        expected = np.asarray(
            jnp_ref.warp_image(jnp.asarray(img), jnp.asarray(z), jnp.asarray(z + 3.0))
        )
        np.testing.assert_allclose(got, expected, atol=1e-3)

    def test_zero_flow_is_identity(self, rng):
        from tpuflow.kernels import pallas_warp

        img = rng.uniform(0, 255, (48, 160)).astype(np.float32)
        z = np.zeros_like(img)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(jnp.asarray(img), jnp.asarray(z), jnp.asarray(z))
            )
        np.testing.assert_allclose(got, img, atol=1e-4)

    def test_packed_u8_matches_exact_on_integer_frames(self, rng):
        """packed_u8 (one i32 corner-pair gather per candidate row, 4x
        fewer hardware gathers) vs the exact kernel on an 8-bit-integer-
        valued frame: equal to FMA-contraction rounding. On real TPU the
        two compile bit-identically (verified on v5e at 1080p — maxdiff
        exactly 0.0 at bands 8/3/2); interpret mode's XLA:CPU fuses the
        corner lerp differently per program, hence the 1-ulp tolerance
        here rather than array_equal."""
        from tpuflow.kernels import pallas_warp

        img = rng.integers(0, 256, (48, 200)).astype(np.float32)
        u = rng.uniform(-10, 10, (48, 200)).astype(np.float32)
        v = rng.uniform(-10, 10, (48, 200)).astype(np.float32)
        for mdv in (8, 3, 2):
            with pltpu.force_tpu_interpret_mode():
                a = pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                    max_disp=8, clamp_flow=True, max_disp_v=mdv,
                )
                b = pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                    max_disp=8, clamp_flow=True, max_disp_v=mdv,
                    packed_u8=True,
                )
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-7, atol=0
            )

    def test_packed_u16_within_quantization_on_float_frames(self, rng):
        """packed_u16 (two 8.8 fixed-point corners per i32 gather, 2x
        fewer hardware gathers) vs the exact kernel on NON-integer float
        frames — the blurred coarse pyramid levels packed_u8 cannot
        serve. Error bound: each corner quantizes to 1/256 with
        round-to-nearest (+-1/512), and bilinear interpolation is a
        convex combination, so |err| <= 1/512 + lerp rounding."""
        from tpuflow.kernels import pallas_warp

        img = rng.uniform(0, 255, (48, 200)).astype(np.float32)
        u = rng.uniform(-10, 10, (48, 200)).astype(np.float32)
        v = rng.uniform(-10, 10, (48, 200)).astype(np.float32)
        for mdv in (8, 3, 2):
            with pltpu.force_tpu_interpret_mode():
                a = pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                    max_disp=8, clamp_flow=True, max_disp_v=mdv,
                )
                b = pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                    max_disp=8, clamp_flow=True, max_disp_v=mdv,
                    packed_u16=True,
                )
            err = np.abs(np.asarray(a) - np.asarray(b))
            assert err.max() <= 1.0 / 256.0 + 1e-5, (mdv, err.max())

    def test_packed_u16_zero_flow_identity_to_quantization(self, rng):
        """Zero flow must reproduce the frame to 8.8 rounding (the warp
        degenerates to the quantizer itself)."""
        from tpuflow.kernels import pallas_warp

        img = rng.uniform(0, 255, (24, 160)).astype(np.float32)
        z = np.zeros_like(img)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(img), jnp.asarray(z), jnp.asarray(z),
                    clamp_flow=True, packed_u16=True,
                )
            )
        q = np.floor(img * 256.0 + 0.5) / 256.0
        np.testing.assert_allclose(got, q, atol=1e-5)

    def test_packed_flags_are_exclusive(self, rng):
        from tpuflow.kernels import pallas_warp

        img, u, v = self._pair(rng, h=16, w=128)
        with pytest.raises(AssertionError, match="pick one"):
            pallas_warp.warp_image_banded(
                jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                clamp_flow=True, packed_u8=True, packed_u16=True,
            )

    def test_packed_u8_requires_clamp_flow(self, rng):
        from tpuflow.kernels import pallas_warp

        img, u, v = self._pair(rng, h=16, w=128)
        with pytest.raises(AssertionError, match="clamp_flow"):
            pallas_warp.warp_image_banded(
                jnp.asarray(img), jnp.asarray(u), jnp.asarray(v),
                packed_u8=True,
            )

    def test_packed_u8_batched_matches_per_frame(self, rng):
        from tpuflow.kernels import pallas_warp

        imgs = rng.integers(0, 256, (3, 24, 128)).astype(np.float32)
        us = rng.uniform(-6, 6, (3, 24, 128)).astype(np.float32)
        vs = rng.uniform(-6, 6, (3, 24, 128)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            batched = np.asarray(
                pallas_warp.warp_image_banded(
                    jnp.asarray(imgs), jnp.asarray(us), jnp.asarray(vs),
                    clamp_flow=True, packed_u8=True,
                )
            )
            for i in range(3):
                single = np.asarray(
                    pallas_warp.warp_image_banded(
                        jnp.asarray(imgs[i]), jnp.asarray(us[i]),
                        jnp.asarray(vs[i]), clamp_flow=True, packed_u8=True,
                    )
                )
                np.testing.assert_array_equal(batched[i], single)


class TestBatching:
    """Native batch support + custom_vmap composition."""

    def _frames(self, rng, b=3, h=48, w=64):
        from scipy.ndimage import gaussian_filter

        out = []
        for _ in range(2):
            fs = [
                gaussian_filter(
                    rng.uniform(0, 255, (h, w)).astype(np.float32), 2.0
                ).astype(np.float32)
                for _ in range(b)
            ]
            out.append(jnp.asarray(np.stack(fs)))
        return out

    def test_batched_lk_matches_per_frame(self, rng):
        prev, curr = self._frames(rng)
        with pltpu.force_tpu_interpret_mode():
            ub, vb = pallas_lk.lucas_kanade_fused(prev, curr)
            for i in range(prev.shape[0]):
                u1, v1 = pallas_lk.lucas_kanade_fused(prev[i], curr[i])
                np.testing.assert_allclose(np.asarray(ub[i]), np.asarray(u1), atol=1e-5)

    def test_vmap_lk(self, rng):
        prev, curr = self._frames(rng)
        with pltpu.force_tpu_interpret_mode():
            ub, vb = jax.vmap(pallas_lk.lucas_kanade_fused)(prev, curr)
            u1, v1 = pallas_lk.lucas_kanade_fused(prev[0], curr[0])
            np.testing.assert_allclose(np.asarray(ub[0]), np.asarray(u1), atol=1e-5)

    def test_batched_warp_matches_per_frame(self, rng):
        from tpuflow.kernels import pallas_warp

        prev, _ = self._frames(rng)
        b, h, w = prev.shape
        u = jnp.asarray(rng.uniform(-5, 5, (b, h, w)), jnp.float32)
        v = jnp.asarray(rng.uniform(-5, 5, (b, h, w)), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            ob = pallas_warp.warp_image_banded(prev, u, v)
            o1 = pallas_warp.warp_image_banded(prev[1], u[1], v[1])
            np.testing.assert_allclose(np.asarray(ob[1]), np.asarray(o1), atol=1e-5)

    def test_vmap_pyramidal(self, rng):
        # The interpreter's ordered IO effects cannot vmap inside the
        # refinement while_loop; this composition is validated on real
        # TPU (bit-exact vs per-frame). Interpret mode covers the
        # kernels individually above.
        if jax.default_backend() == "cpu":
            pytest.skip("vmap(while_loop(pallas)) unsupported in interpret mode")
        from tpuflow.flow import lucas_kanade_pyramidal

        prev, curr = self._frames(rng, b=2)
        with pltpu.force_tpu_interpret_mode():
            ub, vb = jax.vmap(
                lambda p, c: lucas_kanade_pyramidal(p, c, backend="pallas")
            )(prev, curr)
            u1, v1 = lucas_kanade_pyramidal(prev[0], curr[0], backend="pallas")
            np.testing.assert_allclose(np.asarray(ub[0]), np.asarray(u1), atol=1e-4)


class TestFusedRefine:
    """lucas_kanade_refine (fused clip+LK+accumulate+sums) vs the
    manual composition it replaces."""

    def _setup(self, rng, h=48, w=96):
        prev = rng.uniform(0, 255, (h, w)).astype(np.float32)
        warped = rng.uniform(0, 255, (h, w)).astype(np.float32)
        u = rng.uniform(-9.0, 9.0, (h, w)).astype(np.float32)
        v = rng.uniform(-9.0, 9.0, (h, w)).astype(np.float32)
        return (jnp.asarray(x) for x in (prev, warped, u, v))

    def test_matches_manual_composition(self, rng):
        from tpuflow.kernels import jnp_ref, pallas_lk

        prev, warped, u, v = self._setup(rng)
        with pltpu.force_tpu_interpret_mode():
            u2, v2, sdu, sdv = pallas_lk.lucas_kanade_refine(
                prev, warped, u, v, jnp.asarray(False)
            )
        ix, iy, it = jnp_ref.compute_gradients(prev, warped)
        du, dv = jnp_ref.lucas_kanade_from_gradients(ix, iy, it)
        uc = jnp.clip(u, -8.0, 8.0)
        vc = jnp.clip(v, -8.0, 8.0)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(uc + du), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(vc + dv), atol=1e-5)
        np.testing.assert_allclose(
            float(sdu), float(jnp.sum(jnp.abs(du))), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(sdv), float(jnp.sum(jnp.abs(dv))), rtol=1e-5
        )

    def test_converged_freezes_flow(self, rng):
        from tpuflow.kernels import pallas_lk

        prev, warped, u, v = self._setup(rng)
        with pltpu.force_tpu_interpret_mode():
            u2, v2, _, _ = pallas_lk.lucas_kanade_refine(
                prev, warped, u, v, jnp.asarray(True)
            )
        np.testing.assert_allclose(
            np.asarray(u2), np.asarray(jnp.clip(u, -8.0, 8.0)), atol=0
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(jnp.clip(v, -8.0, 8.0)), atol=0
        )

    def test_batched_and_vmap(self, rng):
        from tpuflow.kernels import pallas_lk

        h, w = 40, 80
        prev = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
        warped = jnp.asarray(rng.uniform(0, 255, (2, h, w)), jnp.float32)
        u = jnp.zeros((2, h, w), jnp.float32)
        v = jnp.zeros((2, h, w), jnp.float32)
        conv = jnp.asarray([False, True])
        with pltpu.force_tpu_interpret_mode():
            ub, vb, sdu, sdv = pallas_lk.lucas_kanade_refine(
                prev, warped, u, v, conv
            )
            u0, v0, s0, _ = pallas_lk.lucas_kanade_refine(
                prev[0], warped[0], u[0], v[0], jnp.asarray(False)
            )
        assert sdu.shape == (2,)
        np.testing.assert_allclose(np.asarray(ub[0]), np.asarray(u0), atol=1e-6)
        np.testing.assert_allclose(float(sdu[0]), float(s0), rtol=1e-6)
        # Element 1 is frozen: flow passes through (zeros stay zeros).
        assert np.all(np.asarray(ub[1]) == 0)

    def test_refine_narrow_vertical_clamp(self, rng):
        # max_disp_v narrows only the vertical carried-flow clamp.
        from tpuflow.kernels import jnp_ref, pallas_lk

        prev, warped, u, v = self._setup(rng)
        with pltpu.force_tpu_interpret_mode():
            u2, v2, _, _ = pallas_lk.lucas_kanade_refine(
                prev, warped, u, v, jnp.asarray(False), max_disp_v=3.0
            )
        ix, iy, it = jnp_ref.compute_gradients(prev, warped)
        du, dv = jnp_ref.lucas_kanade_from_gradients(ix, iy, it)
        np.testing.assert_allclose(
            np.asarray(u2), np.asarray(jnp.clip(u, -8.0, 8.0) + du), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(jnp.clip(v, -3.0, 3.0) + dv), atol=1e-5
        )

    def test_clamp_flow_warp_kwarg(self, rng):
        from tpuflow.kernels import pallas_warp

        h, w = 32, 64
        img = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
        u = jnp.full((h, w), 30.0)
        v = jnp.zeros((h, w))
        with pltpu.force_tpu_interpret_mode():
            a = pallas_warp.warp_image_banded(img, u, v, clamp_flow=True)
            b = pallas_warp.warp_image_banded(
                img, jnp.clip(u, -8.0, 8.0), v
            )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gaussian_weights_pallas_matches_jnp(rng):
    """The fast path honors the Gaussian-window option (BASELINE config
    2): separable in-kernel weighted sums match the jnp 2-D weighted
    correlation to f32 rounding."""
    from tpuflow.flow import lucas_kanade_single_scale

    prev = jnp.asarray(rng.uniform(0, 255, (48, 96)), jnp.float32)
    curr = jnp.roll(prev, 1, axis=1)
    uj, vj = lucas_kanade_single_scale(
        prev, curr, backend="jnp", gaussian_weights=True
    )
    with pltpu.force_tpu_interpret_mode():
        up, vp = lucas_kanade_single_scale(
            prev, curr, backend="pallas", gaussian_weights=True
        )
    np.testing.assert_allclose(np.asarray(up), np.asarray(uj), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vj), atol=1e-4)
    # And it actually changes the result vs the uniform window.
    uu, _ = lucas_kanade_single_scale(prev, curr, backend="jnp")
    assert np.abs(np.asarray(uu) - np.asarray(uj)).max() > 1e-4


def test_pyramidal_narrow_vertical_config(frame_pair):
    """The narrow_vertical named config stays at accuracy parity with
    the default fast path on horizontally-dominant motion — the
    production contract of the narrowed band. Pointwise the fields
    differ where LK noise exceeds +-3 px vertically (the clamp
    regularizes untextured-region garbage — measured it slightly
    *improves* MAE here), so the gate is metric-based like the
    verifier's, not bit-exact."""
    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.flow import lucas_kanade_pyramidal

    prev, curr = (jnp.asarray(f) for f in frame_pair)  # 2 px horizontal
    with pltpu.force_tpu_interpret_mode():
        u_d, v_d = lucas_kanade_pyramidal(
            prev, curr, config=PYRAMID_CONFIGS["default"], backend="pallas"
        )
        u_n, v_n = lucas_kanade_pyramidal(
            prev, curr, config=PYRAMID_CONFIGS["narrow_vertical"],
            backend="pallas",
        )
    s = np.s_[10:-10, 10:-10]  # translation-category test region
    mae_u_d = np.abs(np.asarray(u_d)[s] - 2.0).mean()
    mae_u_n = np.abs(np.asarray(u_n)[s] - 2.0).mean()
    mae_v_d = np.abs(np.asarray(v_d)[s]).mean()
    mae_v_n = np.abs(np.asarray(v_n)[s]).mean()
    # Within the verifier's 10% regression envelope of the full band.
    assert mae_u_n <= mae_u_d * 1.10
    assert mae_v_n <= mae_v_d * 1.10


def test_pyramidal_adaptive_vertical_pallas_dispatch(frame_pair):
    """The adaptive band's lax.switch dispatch composes with the pallas
    kernels (switch-of-pallas-calls, no vmap): on the horizontally-
    dominant pair it must reproduce the narrow band's fine levels — same
    composed result as in the jnp twin test
    (tests/test_pyramidal.py::test_adaptive_band_picks_narrow_...)."""
    import dataclasses

    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.flow import lucas_kanade_pyramidal
    from tpuflow.flow.pyramidal import _refine_level
    from tpuflow.kernels import jnp_ref

    prev, curr = (jnp.asarray(f) for f in frame_pair)  # 2 px horizontal
    cfg_a = PYRAMID_CONFIGS["adaptive_vertical"]
    cfg_full = dataclasses.replace(cfg_a, adaptive_v_bands=None)
    cfg_n3 = dataclasses.replace(cfg_a, adaptive_v_bands=None, max_disp_v=3)
    with pltpu.force_tpu_interpret_mode():
        u_a, v_a = lucas_kanade_pyramidal(
            prev, curr, config=cfg_a, backend="pallas"
        )
        pp = jnp_ref.build_gaussian_pyramid(prev, 3)
        pc = jnp_ref.build_gaussian_pyramid(curr, 3)
        u = jnp.zeros(pp[0].shape)
        v = jnp.zeros(pp[0].shape)
        u, v = _refine_level(pp[0], pc[0], u, v, cfg_full, "pallas")
        for lvl in (1, 2):
            u, v = jnp_ref.upsample_flow(u, v, pp[lvl].shape)
            u, v = _refine_level(pp[lvl], pc[lvl], u, v, cfg_n3, "pallas")
    np.testing.assert_array_equal(np.asarray(u_a), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v))


def test_relaxed_order_window_sums_close(rng):
    """Shift-tree window sums (relaxed_order=True) match the exact-order
    kernel to f32 reassociation rounding — for 5x5 and 7x7 windows."""
    from tpuflow.flow import lucas_kanade_single_scale

    prev = jnp.asarray(rng.uniform(0, 255, (48, 160)).astype(np.float32))
    curr = jnp.roll(prev, 1, axis=1)
    for w in (3, 5, 7):
        with pltpu.force_tpu_interpret_mode():
            ue, ve = lucas_kanade_single_scale(prev, curr, w, backend="pallas")
            ur, vr = lucas_kanade_single_scale(
                prev, curr, w, backend="pallas", relaxed_order=True
            )
        np.testing.assert_allclose(np.asarray(ur), np.asarray(ue), atol=1e-4)
        np.testing.assert_allclose(np.asarray(vr), np.asarray(ve), atol=1e-4)
    # The border/det-gate semantics are unchanged: zeros stay exact.
    with pltpu.force_tpu_interpret_mode():
        u0, v0 = lucas_kanade_single_scale(prev, prev, backend="pallas",
                                           relaxed_order=True)
    assert np.all(np.asarray(u0) == 0) and np.all(np.asarray(v0) == 0)


def test_pyramidal_production_config_composes(frame_pair):
    """The production config composes all its relaxations — band ladder,
    relaxed-order sums, packed-u8 finest-level warp — and stays within
    the verifier's 10% envelope of the default fast path on the 8-bit
    bench-class pair. (The TPU-captured production baseline is the
    authoritative gate; this is the CPU CI smoke that the composition
    itself is wired and sane.)"""
    from tpuflow.core.config import PYRAMID_CONFIGS
    from tpuflow.flow import lucas_kanade_pyramidal

    cfg = PYRAMID_CONFIGS["production"]
    assert cfg.warp_packed_u8
    assert cfg.warp_packed_u16  # r4: packed-u16 coarse-level warp
    prev, curr = (jnp.asarray(f) for f in frame_pair)  # 2 px horizontal
    with pltpu.force_tpu_interpret_mode():
        u_d, v_d = lucas_kanade_pyramidal(
            prev, curr, config=PYRAMID_CONFIGS["default"], backend="pallas"
        )
        u_p, v_p = lucas_kanade_pyramidal(
            prev, curr, config=cfg, backend="pallas"
        )
    s = np.s_[10:-10, 10:-10]  # translation-category test region
    mae_u_d = np.abs(np.asarray(u_d)[s] - 2.0).mean()
    mae_u_p = np.abs(np.asarray(u_p)[s] - 2.0).mean()
    mae_v_d = np.abs(np.asarray(v_d)[s]).mean()
    mae_v_p = np.abs(np.asarray(v_p)[s]).mean()
    assert mae_u_p <= mae_u_d * 1.10
    assert mae_v_p <= mae_v_d * 1.10
