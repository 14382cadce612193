"""Gain units: one model, multiple rate points (multi-rate single-model)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lmsfc_tpu.models import LMSFCv2
from lmsfc_tpu.training import create_train_state, make_train_step


def _feats(batch=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.normal(0, 2, (batch, 16, 16, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 2, (batch, 8, 8, 8)).astype(np.float32)),
    ]


def _model():
    return LMSFCv2(
        out_channels=(8, 8), num_filters=16, latent_filters=16, hyper_filters=8,
        dtype=jnp.float32, num_rates=4,
    )


def test_multi_rate_training_orders_rates():
    """After training with per-rate lambdas, higher rate points spend more
    bits and reconstruct better."""
    model = _model()
    feats = _feats()
    state = create_train_state(model, [f[:1] for f in feats], learning_rate=2e-3)
    lmbdas = [0.003, 0.012, 0.05, 0.2]
    step = make_train_step(model, lmbda=0.0, lmbdas=lmbdas)
    key = jax.random.key(0)
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, m = step(state, feats, sub)
    assert np.isfinite(float(m["loss"]))

    # evaluate all rate points on held-out features: the gain vectors must
    # have learned rate control — coded bits increase with lambda. (The
    # distortion ordering emerges with real training budgets; a unit test
    # can only afford ~100 steps, so assert the rate mechanism.)
    test = _feats(seed=9)
    bpps = []
    for r in range(4):
        out = model.apply({"params": state.params}, test, training=False, rate_idx=r)
        lk = out["likelihoods"]
        bits = -(jnp.sum(jnp.log2(lk["y"])) + jnp.sum(jnp.log2(lk["z"])))
        n_px = test[0].shape[0] * 16 * 16 * 16
        bpps.append(float(bits) / n_px)
    # extremes strictly ordered; low half below high half (adjacent points
    # can swap at unit-test training budgets)
    assert bpps[0] < bpps[3], bpps
    assert (bpps[0] + bpps[1]) / 2 < (bpps[2] + bpps[3]) / 2, bpps


def test_single_rate_path_unchanged():
    """num_rates=0 keeps the original parameter tree (no gains params)."""
    model = LMSFCv2(
        out_channels=(8, 8), num_filters=16, latent_filters=16, hyper_filters=8,
        dtype=jnp.float32,
    )
    feats = _feats(batch=1)
    params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
    )["params"]
    assert "gains" not in params


@pytest.mark.slow
def test_gain_codec_roundtrip_with_rate_selection(tmp_path):
    """One set of params, different qp -> different bitstream sizes; decode
    recovers the rate point from the header."""
    from lmsfc_tpu.codecs import LMSFCCodec

    model = _model()
    feats = _feats(batch=1)
    params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats
    )["params"]
    # push the gains apart so rate points differ even untrained
    params = dict(params)
    params["gains"] = jnp.asarray([[0.25] * 16, [0.5] * 16, [1.0] * 16, [2.0] * 16])
    params["inv_gains"] = jnp.asarray([[4.0] * 16, [2.0] * 16, [1.0] * 16, [0.5] * 16])

    data = {
        "p2": jnp.transpose(feats[0], (0, 3, 1, 2)),
        "p3": jnp.transpose(feats[1], (0, 3, 1, 2)),
    }
    sizes = {}
    for qp in (1, 4):
        codec = LMSFCCodec(
            num_filters=16, latent_filters=16, hyper_filters=8,
            out_channels=(8, 8), dtype="float32", num_rates=4, qp=qp, params=params,
        )
        out = codec.encode({"data": data}, tmp_path, f"q{qp}")
        sizes[qp] = sum(out["bytes"])
        dec = codec.decode(out["bitstream"])
        assert dec["data"]["p2"].shape == data["p2"].shape
    assert sizes[1] < sizes[4], sizes  # gain 0.25 vs 2.0 -> fewer bits

    # a decoder constructed at a DIFFERENT qp still decodes correctly
    # (rate point recovered from the header)
    codec_wrong_qp = LMSFCCodec(
        num_filters=16, latent_filters=16, hyper_filters=8,
        out_channels=(8, 8), dtype="float32", num_rates=4, qp=1, params=params,
    )
    codec_q4 = LMSFCCodec(
        num_filters=16, latent_filters=16, hyper_filters=8,
        out_channels=(8, 8), dtype="float32", num_rates=4, qp=4, params=params,
    )
    out4 = codec_q4.encode({"data": data}, tmp_path, "again")
    ref = codec_q4.decode(out4["bitstream"])
    got = codec_wrong_qp.decode(out4["bitstream"])
    np.testing.assert_array_equal(
        np.asarray(ref["data"]["p2"]), np.asarray(got["data"]["p2"])
    )
