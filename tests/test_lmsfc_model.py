import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.models import LMSFCv2
from lmsfc_tpu.parallel import make_mesh
from lmsfc_tpu.training import create_train_state, make_train_step, rd_loss


def tiny_features(batch=2, base=16, key=0, channels=(32, 32, 32, 32)):
    """Synthetic FPN-like pyramid, finest first, NHWC."""
    rng = np.random.default_rng(key)
    feats = []
    h = w = base
    for c in channels:
        feats.append(jnp.asarray(rng.normal(0, 2, (batch, h, w, c)).astype(np.float32)))
        h, w = -(-h // 2), -(-w // 2)
    return feats


def tiny_model(channels=(32, 32, 32, 32)):
    return LMSFCv2(
        out_channels=channels, num_filters=32, latent_filters=32, hyper_filters=16,
        dtype=jnp.float32,
    )


class TestLMSFCForward:
    def test_shapes_roundtrip(self):
        model = tiny_model()
        feats = tiny_features()
        params = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
        )
        out = model.apply(params, feats, training=False)
        assert len(out["features_hat"]) == 4
        for rec, f in zip(out["features_hat"], feats):
            assert rec.shape == f.shape
        for lk in out["likelihoods"].values():
            assert np.all(np.asarray(lk) > 0)

    def test_odd_shapes(self):
        """SFU-like odd spatial dims (25x42 etc.) must reconstruct exactly."""
        model = tiny_model(channels=(8, 8, 8, 8))
        rng = np.random.default_rng(3)
        shapes = [(100, 168), (50, 84), (25, 42), (13, 21)]
        feats = [
            jnp.asarray(rng.normal(size=(1, h, w, 8)).astype(np.float32))
            for h, w in shapes
        ]
        params = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
        )
        out = model.apply(params, feats, training=False)
        for rec, f in zip(out["features_hat"], feats):
            assert rec.shape == f.shape

    def test_jde_channel_pyramid(self):
        """JDE-style pyramid with increasing channels (256,512,1024 scaled down)."""
        model = LMSFCv2(
            out_channels=(16, 32, 64), num_filters=32, latent_filters=32,
            hyper_filters=16, dtype=jnp.float32,
        )
        rng = np.random.default_rng(4)
        feats = [
            jnp.asarray(rng.normal(size=(1, 16, 24, 16)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 8, 12, 32)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 4, 6, 64)).astype(np.float32)),
        ]
        params = model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
        )
        out = model.apply(params, feats, training=False)
        for rec, f in zip(out["features_hat"], feats):
            assert rec.shape == f.shape


class TestTraining:
    def test_loss_decreases(self):
        model = tiny_model(channels=(8, 8))
        model = LMSFCv2(
            out_channels=(8, 8), num_filters=16, latent_filters=16, hyper_filters=8,
            dtype=jnp.float32,
        )
        rng = np.random.default_rng(5)
        feats = [
            jnp.asarray(rng.normal(size=(4, 16, 16, 8)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(4, 8, 8, 8)).astype(np.float32)),
        ]
        state = create_train_state(model, feats, learning_rate=1e-3)
        step = make_train_step(model, lmbda=0.05)
        losses = []
        key = jax.random.key(42)
        for i in range(30):
            key, sub = jax.random.split(key)
            state, metrics = step(state, feats, sub)
            losses.append(float(metrics["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    def test_dp_mesh_train_step(self):
        """8-way data parallel on the virtual CPU mesh."""
        assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
        mesh = make_mesh(dp=8)
        model = LMSFCv2(
            out_channels=(8, 8), num_filters=16, latent_filters=16, hyper_filters=8,
            dtype=jnp.float32,
        )
        rng = np.random.default_rng(6)
        feats = [
            jnp.asarray(rng.normal(size=(8, 16, 16, 8)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(8, 8, 8, 8)).astype(np.float32)),
        ]
        state = create_train_state(model, [f[:1] for f in feats])
        step = make_train_step(model, lmbda=0.05, mesh=mesh)
        state2, metrics = step(state, feats, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        # replicated-vs-sharded numerical agreement (fresh state: step donates)
        state_b = create_train_state(model, [f[:1] for f in feats])
        step_single = make_train_step(model, lmbda=0.05)
        state3, metrics_single = step_single(state_b, feats, jax.random.key(0))
        assert np.allclose(
            float(metrics["loss"]), float(metrics_single["loss"]), rtol=1e-4
        )

    def test_aux_loss_trains_quantiles(self):
        model = LMSFCv2(
            out_channels=(8,), num_filters=16, latent_filters=16, hyper_filters=8,
            dtype=jnp.float32,
        )
        rng = np.random.default_rng(7)
        feats = [jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))]
        state = create_train_state(model, feats)
        q0 = np.asarray(state.params["entropy_bottleneck"]["quantiles"]).copy()
        step = make_train_step(model, lmbda=0.05)
        key = jax.random.key(0)
        for _ in range(5):
            key, sub = jax.random.split(key)
            state, metrics = step(state, feats, sub)
        q1 = np.asarray(state.params["entropy_bottleneck"]["quantiles"])
        assert not np.allclose(q0, q1), "quantiles should move under aux loss"
