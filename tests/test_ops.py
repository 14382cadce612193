import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.ops import (
    compute_frame_resolution,
    lower_bound,
    min_max_inv_normalization,
    min_max_normalization,
    pack_feature_dict_to_frames,
    ste_round,
    tensor_to_tiled,
    tiled_to_tensor,
    unpack_frames_to_feature_dict,
    upper_bound,
)
from lmsfc_tpu.ops.gdn import gdn


class TestBounds:
    def test_lower_bound_forward(self):
        x = jnp.array([-1.0, 0.5, 2.0])
        assert np.allclose(lower_bound(x, 0.0), [0.0, 0.5, 2.0])

    def test_lower_bound_grad(self):
        # grad passes when x >= bound, or when g < 0 (pushes x up)
        f = lambda x: jnp.sum(lower_bound(x, 0.0))
        g = jax.grad(f)(jnp.array([-1.0, 1.0]))
        assert np.allclose(g, [0.0, 1.0])
        f2 = lambda x: -jnp.sum(lower_bound(x, 0.0))
        g2 = jax.grad(f2)(jnp.array([-1.0, 1.0]))
        assert np.allclose(g2, [-1.0, -1.0])

    def test_upper_bound_grad(self):
        # g > 0 passes even outside the bound (descent moves x back inside)
        f = lambda x: jnp.sum(upper_bound(x, 0.0))
        g = jax.grad(f)(jnp.array([-1.0, 1.0]))
        assert np.allclose(g, [1.0, 1.0])
        f2 = lambda x: -jnp.sum(upper_bound(x, 0.0))
        g2 = jax.grad(f2)(jnp.array([-1.0, 1.0]))
        assert np.allclose(g2, [-1.0, 0.0])


class TestQuant:
    def test_min_max_roundtrip_midlevel(self):
        # SFUHW constants (ref codecs/utils.py:38)
        minv, maxv = -17.8848, 16.69417
        x = jnp.array([minv, 0.0, maxv, -20.0, 20.0])
        q, mid = min_max_normalization(x, minv, maxv, 10)
        assert q.min() >= 0 and q.max() <= 1023
        assert mid == int((-minv / (maxv - minv)) * 1023 + 0.5)
        back = min_max_inv_normalization(q, minv, maxv, 10)
        # floor quantization error bound: (max-min)/1023
        assert np.all(np.abs(np.clip(x, minv, maxv) - back) <= (maxv - minv) / 1023 + 1e-5)

    def test_ste_round_grad(self):
        g = jax.grad(lambda x: jnp.sum(ste_round(x) ** 2))(jnp.array([1.2]))
        # straight-through: d/dx (round(x)^2) ~ 2*round(x)
        assert np.allclose(g, [2.0])


class TestTiling:
    def test_frame_resolution_matches_reference_geometry(self):
        # 256 channels of 200x336 -> 16x16 grid (square), ref SFUHW p2 => 3200x5376
        assert compute_frame_resolution(256, 200, 336) == (3200, 5376)
        # p3 100x168 -> but rescaled later; raw: 16*100, 16*168
        assert compute_frame_resolution(256, 100, 168) == (1600, 2688)

    def test_tile_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 16, 10, 12)).astype(np.float32))
        fh, fw = compute_frame_resolution(16, 10, 12)
        tiled = tensor_to_tiled(x, (fh, fw))
        assert tiled.shape == (3, fh, fw)
        back = tiled_to_tensor(tiled, (10, 12))
        assert np.array_equal(np.asarray(back), np.asarray(x))

    @pytest.mark.slow
    def test_pack_unpack_pyramid_sfuhw_geometry(self):
        """SFU-HW FPN geometry (BASELINE.md fixtures): subframe heights 3200/800/200/50."""
        rng = np.random.default_rng(1)
        x = {
            "p2": jnp.asarray(rng.normal(size=(2, 256, 200, 336)).astype(np.float32)),
            "p3": jnp.asarray(rng.normal(size=(2, 256, 100, 168)).astype(np.float32)),
            "p4": jnp.asarray(rng.normal(size=(2, 256, 50, 84)).astype(np.float32)),
            "p5": jnp.asarray(rng.normal(size=(2, 256, 25, 42)).astype(np.float32)),
        }
        packed, fsize, heights = pack_feature_dict_to_frames(x)
        assert heights == {"p2": 3200, "p3": 800, "p4": 200, "p5": 50}
        assert packed.shape == (2, 3200 + 800 + 200 + 50, 5376)
        back = unpack_frames_to_feature_dict(packed, fsize, heights)
        for k in x:
            assert np.array_equal(np.asarray(back[k]), np.asarray(x[k])), k

    def test_pack_unpack_jde_geometry(self):
        """TVD JDE layers 36/61/74 geometry: heights 1216/608/304 (BASELINE.md)."""
        rng = np.random.default_rng(2)
        x = {
            "l36": jnp.asarray(rng.normal(size=(1, 256, 76, 136)).astype(np.float32)),
            "l61": jnp.asarray(rng.normal(size=(1, 512, 38, 68)).astype(np.float32)),
            "l74": jnp.asarray(rng.normal(size=(1, 1024, 19, 34)).astype(np.float32)),
        }
        packed, fsize, heights = pack_feature_dict_to_frames(x, anchor="widest")
        assert heights == {"l36": 1216, "l61": 608, "l74": 304}
        back = unpack_frames_to_feature_dict(packed, fsize, heights)
        for k in x:
            assert np.array_equal(np.asarray(back[k]), np.asarray(x[k])), k


class TestGDN:
    def test_forward_matches_reference_formula(self):
        rng = np.random.default_rng(3)
        c = 8
        x = jnp.asarray(rng.normal(size=(2, 5, 7, c)).astype(np.float32))
        gamma = jnp.asarray((0.1 * np.eye(c)).astype(np.float32))
        beta = jnp.ones((c,), jnp.float32)
        y = gdn(x, gamma, beta)
        expected = x / jnp.sqrt(1.0 + 0.1 * x * x)
        # rtol loose enough for TPU rsqrt approximation when run on hardware
        assert np.allclose(np.asarray(y), np.asarray(expected), rtol=1e-3, atol=1e-4)

    def test_igdn_inverts_gdn_approximately_identity_gamma_zero(self):
        rng = np.random.default_rng(4)
        c = 4
        x = jnp.asarray(rng.normal(size=(10, c)).astype(np.float32))
        gamma = jnp.zeros((c, c), jnp.float32)
        beta = 4.0 * jnp.ones((c,), jnp.float32)
        y = gdn(x, gamma, beta, inverse=False)
        z = gdn(y, gamma, beta, inverse=True)
        assert np.allclose(np.asarray(z), np.asarray(x), atol=1e-5)

    def test_grad_matches_autodiff_of_reference(self):
        rng = np.random.default_rng(5)
        c = 6
        x = jnp.asarray(rng.normal(size=(9, c)).astype(np.float32))
        gamma = jnp.asarray(np.abs(rng.normal(size=(c, c))).astype(np.float32) * 0.05)
        beta = jnp.ones((c,), jnp.float32) * 0.7

        def loss_custom(x, gamma, beta):
            return jnp.sum(gdn(x, gamma, beta) ** 2)

        def loss_ref(x, gamma, beta):
            norm = jnp.sqrt(x * x @ gamma + beta[None, :])
            return jnp.sum((x / norm) ** 2)

        for inverse in (False,):
            gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, gamma, beta)
            gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
            for a, b in zip(gc, gr):
                assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_grad_igdn_matches_autodiff(self):
        rng = np.random.default_rng(6)
        c = 6
        x = jnp.asarray(rng.normal(size=(9, c)).astype(np.float32))
        gamma = jnp.asarray(np.abs(rng.normal(size=(c, c))).astype(np.float32) * 0.05)
        beta = jnp.ones((c,), jnp.float32) * 0.7

        def loss_custom(x, gamma, beta):
            return jnp.sum(gdn(x, gamma, beta, inverse=True) ** 2)

        def loss_ref(x, gamma, beta):
            norm = jnp.sqrt(x * x @ gamma + beta[None, :])
            return jnp.sum((x * norm) ** 2)

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, gamma, beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b in zip(gc, gr):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
