"""Spatial (sequence-parallel analog) sharding of the codec transforms.

SURVEY.md §2.11(c): the FCM analogue of long-context scaling is the packed
feature frame's spatial axes. Convs under GSPMD handle halo exchange
automatically when H is sharded; this verifies a dp x tp layout
(batch on dp, height on tp) reproduces unsharded numerics on the virtual
8-device mesh. On TPU the Pallas GDN kernel would block partitioning, so the
model's xla GDN path is what sharded configs use (CPU tests already use it).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lmsfc_tpu.models import LMSFCv2
from lmsfc_tpu.parallel import make_mesh


def test_spatial_sharded_forward_matches_unsharded():
    assert jax.device_count() >= 8
    mesh = make_mesh(dp=2, tp=4)
    model = LMSFCv2(
        out_channels=(8, 8), num_filters=16, latent_filters=16, hyper_filters=8,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(0, 2, (2, 32, 16, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 2, (2, 16, 8, 8)).astype(np.float32)),
    ]
    params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, feats, training=False
    )["params"]

    def fwd(params, feats):
        out = model.apply({"params": params}, feats, training=False)
        return out["features_hat"], out["likelihoods"]

    ref_recon, ref_lk = jax.jit(fwd)(params, feats)

    repl = NamedSharding(mesh, P())
    spatial = NamedSharding(mesh, P("dp", "tp"))  # batch x height
    sharded_fwd = jax.jit(fwd, in_shardings=(repl, spatial), out_shardings=repl)
    feats_sh = [jax.device_put(f, spatial) for f in feats]
    params_repl = jax.device_put(params, repl)
    got_recon, got_lk = sharded_fwd(params_repl, feats_sh)

    for a, b in zip(ref_recon, got_recon):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    for k in ref_lk:
        np.testing.assert_allclose(
            np.asarray(ref_lk[k]), np.asarray(got_lk[k]), rtol=1e-4, atol=1e-6
        )
