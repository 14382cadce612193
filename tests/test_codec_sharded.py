"""Frame-axis-sharded learned-codec eval over the virtual dp mesh, plus
chunked coding of long sequences (SURVEY.md §2.11(b): the concatenated
[N,C,H,W] video tensor is embarrassingly parallel for the learned codec)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.codecs import LMSFCCodec
from lmsfc_tpu.parallel import make_mesh


def _data(n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "p2": jnp.asarray(rng.normal(0, 2, (n_frames, 8, 16, 16)).astype(np.float32)),
        "p3": jnp.asarray(rng.normal(0, 2, (n_frames, 8, 8, 8)).astype(np.float32)),
    }


def _codec(**kw):
    return LMSFCCodec(
        num_filters=16, latent_filters=16, hyper_filters=8,
        out_channels=(8, 8), dtype="float32", **kw,
    )


@pytest.mark.slow
def test_chunked_equals_unchunked(tmp_path):
    """Sequence longer than the chunk codes identically to per-frame shapes."""
    data = _data(5, seed=1)
    c_small = _codec(chunk_frames=2)
    out = c_small.encode({"data": data}, tmp_path, "chunked")
    assert len(out["bytes"]) == 5
    dec = c_small.decode(out["bitstream"])
    assert dec["data"]["p2"].shape == (5, 8, 16, 16)

    # reconstruction must not depend on chunking (frames are independent)
    c_big = _codec(chunk_frames=8, params=c_small.params)
    dec2 = c_big.decode(out["bitstream"])
    for k in data:
        np.testing.assert_allclose(
            np.asarray(dec["data"][k]), np.asarray(dec2["data"][k]), rtol=2e-4, atol=2e-4
        )


@pytest.mark.slow
def test_dp_sharded_eval(tmp_path):
    assert jax.device_count() >= 8
    mesh = make_mesh(dp=8)
    data = _data(8, seed=2)
    c_sharded = _codec(chunk_frames=8, mesh=mesh)
    out = c_sharded.encode({"data": data}, tmp_path, "sharded")
    dec = c_sharded.decode(out["bitstream"])
    assert dec["data"]["p2"].shape == (8, 8, 16, 16)

    # numerically matches the unsharded path on the same params
    c_plain = _codec(chunk_frames=8, params=c_sharded.params)
    out2 = c_plain.encode({"data": data}, tmp_path / "p", "plain")
    dec2 = c_plain.decode(out2["bitstream"])
    for k in data:
        np.testing.assert_allclose(
            np.asarray(dec["data"][k]), np.asarray(dec2["data"][k]), rtol=2e-4, atol=2e-4
        )
    # sharded and plain bitstreams should be byte-identical when the mesh
    # doesn't change per-frame math
    assert out["bytes"] == pytest.approx(out2["bytes"], rel=0.05)
