"""ChARM channel-autoregressive entropy model (num_slices > 0).

Beyond the reference's mean-scale hyperprior (SURVEY.md §2.9): each channel
slice of the latent conditions on the hyperprior AND all previously decoded
slices (Minnen & Singh 2020, arXiv:2007.08739 — see PAPERS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.codecs.learned import LMSFCCodec
from lmsfc_tpu.models.lmsfc import LMSFCv2
from lmsfc_tpu.training import rd_loss


def _features(batch=2, base=16, channels=(8, 8), seed=0, ch_corr=False):
    """NHWC feature list; ch_corr=True makes channels linear mixtures of a
    few shared latent fields — exactly the cross-channel structure ChARM
    can exploit and a spatial-only hyperprior cannot."""
    rng = np.random.default_rng(seed)
    feats = []
    h = w = base
    for c in channels:
        if ch_corr:
            basis = rng.normal(0, 2, (batch, h, w, 2)).astype(np.float32)
            mix = rng.normal(0, 1, (2, c)).astype(np.float32)
            f = basis @ mix + rng.normal(0, 0.1, (batch, h, w, c)).astype(np.float32)
        else:
            f = rng.normal(0, 2, (batch, h, w, c)).astype(np.float32)
        feats.append(jnp.asarray(f))
        h, w = -(-h // 2), -(-w // 2)
    return feats


def _model(num_slices, latent=16):
    return LMSFCv2(
        out_channels=(8, 8), num_filters=16, latent_filters=latent,
        hyper_filters=8, dtype=jnp.float32, num_slices=num_slices,
    )


class TestCharmModel:
    def test_forward_shapes_and_likelihoods(self):
        model = _model(num_slices=4)
        feats = _features()
        variables = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
        )
        out = model.apply(
            variables, feats, training=False
        )
        assert out["latents"]["y_hat"].shape[-1] == 16
        assert out["likelihoods"]["y"].shape == out["latents"]["y_hat"].shape
        assert all(np.all(np.asarray(lk) > 0) for lk in out["likelihoods"].values())
        for r, f in zip(out["features_hat"], feats):
            assert r.shape == f.shape
        # slice networks exist as learned params
        assert "slice0" in variables["params"] and "slice3" in variables["params"]

    def test_indivisible_slices_rejected(self):
        with pytest.raises(AssertionError):
            _model(num_slices=3).init(
                {"params": jax.random.key(0), "noise": jax.random.key(1)},
                _features(),
            )

    @pytest.mark.slow
    def test_rd_loss_trains(self):
        import optax

        model = _model(num_slices=2)
        feats = _features(ch_corr=True, seed=3)
        params = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
        )["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                out = model.apply(
                    {"params": p}, feats, training=True, rngs={"noise": rng}
                )
                return rd_loss(out, feats, lmbda=0.05)["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for i in range(30):
            params, opt_state, loss = step(params, opt_state, jax.random.key(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestCharmCodec:
    def _codec(self, **kw):
        return LMSFCCodec(
            num_filters=16, latent_filters=16, hyper_filters=8,
            out_channels=(8, 8), dtype="float32", num_slices=4, **kw,
        )

    def test_roundtrip_bitstream(self, tmp_path):
        codec = self._codec()
        feats = _features(batch=3, seed=5)
        data = {
            f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2)) for i, f in enumerate(feats)
        }
        out = codec.encode({"data": data}, tmp_path, "c")
        assert len(out["bytes"]) == 3 and all(b > 0 for b in out["bytes"])
        file_size = (tmp_path / "c.bin").stat().st_size
        assert sum(out["bytes"]) == pytest.approx(file_size, rel=0.01)
        dec = codec.decode(out["bitstream"])
        for k in data:
            assert dec["data"][k].shape == data[k].shape
        # deterministic: decode twice -> identical
        dec2 = codec.decode(out["bitstream"])
        for k in data:
            assert np.array_equal(np.asarray(dec["data"][k]), np.asarray(dec2["data"][k]))

    def test_lrp_roundtrip_and_effect(self, tmp_path):
        """ChARM + latent residual prediction (Minnen & Singh 2020 §III-C):
        the LRP-corrected conditioning chain must stay bit-synced between
        encoder and decoder (deterministic roundtrip), and the LRP nets
        must actually participate (decode differs from a codec whose LRP
        output is forced elsewhere via different params)."""
        codec = self._codec(lrp=True, seed=11)
        assert "lrp0" in codec.params  # nets exist in the param tree
        feats = _features(batch=3, seed=21)
        data = {
            f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2)) for i, f in enumerate(feats)
        }
        out = codec.encode({"data": data}, tmp_path, "lrp")
        dec = codec.decode(out["bitstream"])
        dec2 = codec.decode(out["bitstream"])
        for k in data:
            assert dec["data"][k].shape == data[k].shape
            assert np.array_equal(
                np.asarray(dec["data"][k]), np.asarray(dec2["data"][k])
            )
        # model-forward (eval) and codec must agree: the codec's chained
        # slice programs implement exactly _charm_code at training=False
        model_out = codec.model.apply(
            {"params": codec.params}, feats, training=False
        )
        for lvl, k in enumerate(data):
            np.testing.assert_allclose(
                np.asarray(dec["data"][k]),
                np.transpose(np.asarray(model_out["features_hat"][lvl]), (0, 3, 1, 2)),
                rtol=2e-4, atol=2e-4,
            )

    @pytest.mark.slow
    def test_slice_count_mismatch_fails_loudly(self, tmp_path):
        codec = self._codec()
        feats = _features(batch=1, seed=6)
        data = {f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2)) for i, f in enumerate(feats)}
        out = codec.encode({"data": data}, tmp_path, "m")
        plain = LMSFCCodec(
            num_filters=16, latent_filters=16, hyper_filters=8,
            out_channels=(8, 8), dtype="float32", params=codec.params,
        )
        with pytest.raises(AssertionError, match="num_slices"):
            plain.decode(out["bitstream"])

    @pytest.mark.slow
    def test_multi_chunk_charm(self, tmp_path):
        """n_frames > chunk_frames with a padded tail: exercises the
        flattened batched-download interleaving on encode and the
        multi-chunk merge in _decode_charm; chunking must not change the
        reconstruction (frames are independent)."""
        c_small = self._codec(chunk_frames=4)
        feats = _features(batch=10, seed=13)
        data = {f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2)) for i, f in enumerate(feats)}
        out = c_small.encode({"data": data}, tmp_path, "mc")
        assert len(out["bytes"]) == 10
        dec = c_small.decode(out["bitstream"])
        assert dec["data"]["p2"].shape == data["p2"].shape

        c_one = self._codec(chunk_frames=16, params=c_small.params)
        out2 = c_one.encode({"data": data}, tmp_path / "one", "mc1")
        dec2 = c_one.decode(out2["bitstream"])
        for k in data:
            np.testing.assert_allclose(
                np.asarray(dec["data"][k]), np.asarray(dec2["data"][k]),
                rtol=2e-4, atol=2e-4,
            )
        # per-frame sizes must agree across chunkings (same symbols coded)
        assert out["bytes"] == pytest.approx(out2["bytes"], rel=0.05)

    @pytest.mark.slow
    def test_charm_with_gain_units(self, tmp_path):
        """ChARM composes with gain units: one model, multiple rate points,
        slice-conditioned coding; higher qp must not cost more bits."""
        codec_q1 = LMSFCCodec(
            num_filters=16, latent_filters=16, hyper_filters=8,
            out_channels=(8, 8), dtype="float32",
            num_slices=2, num_rates=2, qp=1, seed=3,
        )
        codec_q2 = LMSFCCodec(
            num_filters=16, latent_filters=16, hyper_filters=8,
            out_channels=(8, 8), dtype="float32",
            num_slices=2, num_rates=2, qp=2, params=codec_q1.params,
        )
        feats = _features(batch=2, seed=9)
        data = {f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2)) for i, f in enumerate(feats)}
        out1 = codec_q1.encode({"data": data}, tmp_path, "q1")
        out2 = codec_q2.encode({"data": data}, tmp_path, "q2")
        # the qp-1 codec decodes the qp-2 stream (rate_idx rides the header)
        dec = codec_q1.decode(out2["bitstream"])
        dec2 = codec_q2.decode(out2["bitstream"])
        for k in data:
            assert dec["data"][k].shape == data[k].shape
            np.testing.assert_array_equal(
                np.asarray(dec["data"][k]), np.asarray(dec2["data"][k])
            )

    @pytest.mark.slow
    def test_dp_sharded_charm(self, tmp_path):
        """ChARM under the dp mesh: slice conditioning concats happen
        outside jit on sharded arrays — must still roundtrip and match the
        unsharded codec numerically."""
        import jax as _jax

        from lmsfc_tpu.parallel import make_mesh

        assert _jax.device_count() >= 8
        mesh = make_mesh(dp=8)
        feats = _features(batch=8, seed=11)
        data = {f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2)) for i, f in enumerate(feats)}
        c_sh = self._codec(chunk_frames=8, mesh=mesh)
        out = c_sh.encode({"data": data}, tmp_path, "sh")
        dec = c_sh.decode(out["bitstream"])
        c_plain = self._codec(chunk_frames=8, params=c_sh.params)
        out2 = c_plain.encode({"data": data}, tmp_path / "p", "pl")
        dec2 = c_plain.decode(out2["bitstream"])
        for k in data:
            np.testing.assert_allclose(
                np.asarray(dec["data"][k]), np.asarray(dec2["data"][k]),
                rtol=2e-4, atol=2e-4,
            )
        assert out["bytes"] == pytest.approx(out2["bytes"], rel=0.05)

    @pytest.mark.slow
    def test_trained_charm_beats_hyperprior_on_channel_correlation(self, tmp_path):
        """Train tiny ChARM and plain models on channel-correlated features;
        ChARM must spend measurably fewer bits at comparable distortion
        (the cross-channel structure is invisible to the hyperprior)."""
        import optax

        feats = _features(batch=4, base=16, channels=(8, 8), seed=7, ch_corr=True)

        def train(num_slices, steps=150):
            model = LMSFCv2(
                out_channels=(8, 8), num_filters=16, latent_filters=16,
                hyper_filters=8, dtype=jnp.float32, num_slices=num_slices,
            )
            params = model.init(
                {"params": jax.random.key(1), "noise": jax.random.key(2)}, feats
            )["params"]
            opt = optax.adam(1e-3)
            opt_state = opt.init(params)

            @jax.jit
            def step(params, opt_state, rng):
                def loss_fn(p):
                    out = model.apply(
                        {"params": p}, feats, training=True, rngs={"noise": rng}
                    )
                    losses = rd_loss(out, feats, lmbda=0.2)
                    return losses["loss"], losses

                (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = opt.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state, losses

            for i in range(steps):
                params, opt_state, losses = step(params, opt_state, jax.random.key(10 + i))
            # real coded size through the bitstream, not the proxy loss
            codec = LMSFCCodec(
                num_filters=16, latent_filters=16, hyper_filters=8,
                out_channels=(8, 8), dtype="float32",
                num_slices=num_slices, params=params,
            )
            data = {
                f"p{i+2}": jnp.transpose(f, (0, 3, 1, 2))
                for i, f in enumerate(feats)
            }
            out = codec.encode({"data": data}, tmp_path, f"s{num_slices}")
            dec = codec.decode(out["bitstream"])
            mse = float(
                np.mean(
                    [
                        np.mean((np.asarray(dec["data"][k]) - np.asarray(v)) ** 2)
                        for k, v in data.items()
                    ]
                )
            )
            return sum(out["bytes"]), mse, float(losses["mse"])

        bytes_charm, mse_charm, _ = train(num_slices=2)
        bytes_plain, mse_plain, _ = train(num_slices=0)
        # ChARM must not lose on BOTH axes, and must win clearly on at
        # least rate at roughly comparable distortion
        assert bytes_charm < bytes_plain * 0.95, (bytes_charm, bytes_plain)
        assert mse_charm < mse_plain * 2.0, (mse_charm, mse_plain)
