import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.entropy import EntropyBottleneck, GaussianConditional, SCALES_TABLE
from lmsfc_tpu.entropy.entropy_bottleneck import build_eb_cdf_table, eb_build_indexes
from lmsfc_tpu.native import RansDecoder, RansEncoder, ensure_built


@pytest.fixture(scope="module", autouse=True)
def built():
    ensure_built()


class TestEntropyBottleneck:
    def _init(self, channels=8):
        eb = EntropyBottleneck(channels=channels)
        x = jnp.zeros((2, 4, 4, channels), jnp.float32)
        params = eb.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, x)
        return eb, params

    def test_likelihood_shapes_and_range(self):
        eb, params = self._init()
        x = jax.random.normal(jax.random.key(2), (2, 4, 4, 8)) * 3
        y_hat, lk = eb.apply(params, x, training=False)
        assert y_hat.shape == x.shape and lk.shape == x.shape
        assert np.all(np.asarray(lk) > 0) and np.all(np.asarray(lk) <= 1)

    def test_training_noise_vs_eval_round(self):
        eb, params = self._init()
        x = jax.random.normal(jax.random.key(3), (1, 2, 2, 8)) * 2
        y_train, _ = eb.apply(params, x, training=True, rngs={"noise": jax.random.key(4)})
        assert np.all(np.abs(np.asarray(y_train - x)) <= 0.5 + 1e-6)
        y_eval, _ = eb.apply(params, x, training=False)
        med = np.asarray(params["params"]["quantiles"])[:, 0, 1]
        expect = np.round(np.asarray(x) - med) + med
        assert np.allclose(np.asarray(y_eval), expect, atol=1e-5)

    def test_bits_estimate_reasonable(self):
        """-log2 likelihood of round(x) should approximate a few bits/sym."""
        eb, params = self._init(channels=4)
        x = jax.random.normal(jax.random.key(5), (4, 8, 8, 4)) * 2
        _, lk = eb.apply(params, x, training=False)
        bits = -np.log2(np.asarray(lk)).sum() / x.size
        assert 0.5 < bits < 16

    def test_aux_loss_positive_scalar(self):
        eb, params = self._init()
        aux = eb.apply(params, method=eb.aux_loss)
        assert np.asarray(aux).shape == () and float(aux) > 0

    def test_compress_decompress_roundtrip(self):
        eb, params = self._init(channels=6)
        table = build_eb_cdf_table(params["params"])
        x = jax.random.normal(jax.random.key(6), (2, 4, 4, 6)) * 3
        med = np.asarray(params["params"]["quantiles"])[:, 0, 1]
        symbols = np.round(np.asarray(x) - med).astype(np.int32)
        indexes = eb_build_indexes(symbols.shape, 6)
        enc, dec = RansEncoder(), RansDecoder()
        bs = enc.encode_with_indexes(
            symbols.ravel(), indexes.ravel(), table.cdfs, table.cdf_lengths, table.offsets
        )
        out = dec.decode_with_indexes(
            bs, indexes.ravel(), table.cdfs, table.cdf_lengths, table.offsets
        )
        assert np.array_equal(out.reshape(symbols.shape), symbols)

    def test_rate_matches_likelihood_estimate(self):
        """Actual coded bits ~= sum(-log2 p) from the likelihood model."""
        eb, params = self._init(channels=4)
        x = jax.random.normal(jax.random.key(7), (8, 16, 16, 4)) * 2
        _, lk = eb.apply(params, x, training=False)
        est_bits = float(-jnp.sum(jnp.log2(lk)))
        table = build_eb_cdf_table(params["params"])
        med = np.asarray(params["params"]["quantiles"])[:, 0, 1]
        symbols = np.round(np.asarray(x) - med).astype(np.int32)
        indexes = eb_build_indexes(symbols.shape, 4)
        enc = RansEncoder()
        bs = enc.encode_with_indexes(
            symbols.ravel(), indexes.ravel(), table.cdfs, table.cdf_lengths, table.offsets
        )
        actual_bits = len(bs) * 8
        assert actual_bits < est_bits * 1.10 + 256, (actual_bits, est_bits)


class TestGaussianConditional:
    def test_likelihood_matches_gaussian_mass(self):
        gc = GaussianConditional()
        y = jnp.array([0.0, 1.0, -2.0])
        scales = jnp.array([1.0, 1.0, 1.0])
        _, lk = gc(y, scales, training=False)
        from scipy.stats import norm

        expect = norm.cdf(np.asarray(y) + 0.5) - norm.cdf(np.asarray(y) - 0.5)
        assert np.allclose(np.asarray(lk), expect, atol=1e-5)

    def test_means_shift(self):
        gc = GaussianConditional()
        y = jnp.array([1.3])
        scales = jnp.array([0.5])
        means = jnp.array([1.0])
        y_hat, lk = gc(y, scales, means, training=False)
        assert np.allclose(np.asarray(y_hat), [1.0])  # round(0.3)+1.0

    def test_build_indexes(self):
        scales = np.array([0.05, 0.11, 0.2, 300.0])
        idx = GaussianConditional.build_indexes(scales)
        assert idx[0] == 0 and idx[1] == 0
        assert idx[-1] == len(SCALES_TABLE) - 1
        assert 0 < idx[2] < len(SCALES_TABLE) - 1
        # table[idx] >= scale for in-range scales
        assert SCALES_TABLE[idx[2]] >= 0.2

    def test_build_indexes_device_matches_host(self):
        """The XLA twin must match the host loop bit-for-bit, including ties
        at exact table entries (a 1-off index desyncs the rANS stream)."""
        rng = np.random.default_rng(11)
        scales = np.concatenate(
            [
                rng.uniform(0.01, 300.0, 4096).astype(np.float32),
                SCALES_TABLE,  # exact ties
                np.nextafter(SCALES_TABLE, np.inf),
                np.nextafter(SCALES_TABLE, -np.inf),
                [0.0, 1e-9, 1e9],
            ]
        ).astype(np.float32)
        host = GaussianConditional.build_indexes(scales)
        dev = np.asarray(
            jax.jit(GaussianConditional.build_indexes_device)(jnp.asarray(scales))
        )
        np.testing.assert_array_equal(host, dev.astype(np.int32))

    def test_roundtrip_through_rans(self):
        gc = GaussianConditional()
        rng = np.random.default_rng(8)
        n = 4000
        scales = np.abs(rng.normal(1.0, 0.5, n)).astype(np.float32) + 0.11
        y = rng.normal(0, scales).astype(np.float32)
        symbols = np.round(y).astype(np.int32)
        indexes = GaussianConditional.build_indexes(scales)
        table = gc.cdf_table()
        enc, dec = RansEncoder(), RansDecoder()
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        out = dec.decode_with_indexes(bs, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)

    def test_rate_near_entropy(self):
        gc = GaussianConditional()
        rng = np.random.default_rng(9)
        n = 50_000
        scales = np.full(n, 2.0, dtype=np.float32)
        y = rng.normal(0, 2.0, n).astype(np.float32)
        symbols = np.round(y).astype(np.int32)
        indexes = GaussianConditional.build_indexes(scales)
        table = gc.cdf_table()
        enc = RansEncoder()
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        _, lk = gc(jnp.asarray(symbols, jnp.float32), jnp.asarray(scales), training=False)
        est_bits = float(-jnp.sum(jnp.log2(lk)))
        assert len(bs) * 8 < est_bits * 1.05 + 128
