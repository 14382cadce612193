"""GDN Pallas kernel vs XLA reference through the Pallas INTERPRETER.

VERDICT r3 weak #7: the TPU-gated equivalence test (test_gdn_tpu.py) only
runs in a TPU window, so a wedged relay leaves the kernel unverified for a
whole round. The interpreter executes the SAME kernel body — tiling, grid,
padding, the x^2 @ gamma contraction, the rsqrt/sqrt epilogue — on the CPU
CI mesh, so kernel-semantics regressions surface in every run. On-hardware
numerics (MXU bf16 accumulation etc.) remain covered by the TPU-window
venues: bench.py's check and LMSFC_TEST_TPU=1 runs of test_gdn_tpu.py.

Ref for what GDN computes: compressai.layers.GDN (reference SURVEY §2.9).
"""

import numpy as np
import pytest

from lmsfc_tpu.ops import gdn as gdn_mod

if not gdn_mod._HAS_PLTPU:  # pragma: no cover
    pytest.skip("pallas tpu module unavailable", allow_module_level=True)


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("c", [128, 192])
def test_gdn_interpret_matches_reference(inverse, c):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # m=1040 exercises multi-tile grids AND the ragged tail: pads to
    # 2 x 512-row tiles with 16 zero rows in the last tile
    x2d = jnp.asarray(rng.normal(0, 2, (1040, c)).astype(np.float32))
    beta = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    gamma = jnp.asarray((0.1 * rng.dirichlet(np.ones(c), c)).astype(np.float32))
    got = np.asarray(
        gdn_mod._gdn_pallas(x2d, gamma, beta, inverse, interpret=True)
    )
    want = np.asarray(gdn_mod._gdn_reference(x2d, gamma, beta, inverse))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    # interpreter runs in f32 like the reference — tight tolerance
    assert err < 1e-5, err


def test_gdn_interpret_small_single_tile():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    c, m = 64, 40  # c pads 64->128, m rounds to one 40-row tile
    x2d = jnp.asarray(rng.normal(0, 1, (m, c)).astype(np.float32))
    beta = jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32))
    gamma = jnp.asarray((0.1 * rng.dirichlet(np.ones(c), c)).astype(np.float32))
    got = np.asarray(gdn_mod._gdn_pallas(x2d, gamma, beta, False, interpret=True))
    want = np.asarray(gdn_mod._gdn_reference(x2d, gamma, beta, False))
    assert np.max(np.abs(got - want)) < 1e-5
