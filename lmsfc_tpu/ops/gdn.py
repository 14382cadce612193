"""GDN / IGDN — Generalized Divisive Normalization (Balle et al.).

    GDN:  y_c = x_c / sqrt(beta_c + sum_k gamma_{c,k} * x_k^2)
    IGDN: y_c = x_c * sqrt(beta_c + sum_k gamma_{c,k} * x_k^2)

The reference uses `compressai.layers.GDN` (torch; ref SURVEY.md §2.9,
examples/vcm/models/bmshj2018-factorized/model.py:8). Here the hot path is a
fused Pallas TPU kernel: the [B*H*W, C] x^2 @ gamma contraction runs on the
MXU and the rsqrt+multiply epilogue stays in VMEM — no HBM round-trip for the
x^2 intermediate. A pure-jnp fallback covers CPU tests and the backward pass
(custom_vjp recomputes the cheap norm rather than saving it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _gdn_reference(x2d: jax.Array, gamma: jax.Array, beta: jax.Array, inverse: bool) -> jax.Array:
    norm = x2d * x2d @ gamma + beta[None, :]
    norm = jnp.sqrt(norm)
    return x2d * norm if inverse else x2d / norm


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:].astype(jnp.float32)
    norm = jnp.dot(x * x, gamma_ref[:], preferred_element_type=jnp.float32)
    norm += beta_ref[:].astype(jnp.float32)
    if inverse:
        out_ref[:] = (x * jnp.sqrt(norm)).astype(out_ref.dtype)
    else:
        out_ref[:] = (x * jax.lax.rsqrt(norm)).astype(out_ref.dtype)


def _gdn_pallas(x2d: jax.Array, gamma: jax.Array, beta: jax.Array, inverse: bool,
                interpret: bool = False) -> jax.Array:
    # interpret=True runs the SAME kernel through the Pallas interpreter on
    # any backend — the CPU CI's venue for verifying kernel semantics
    # (tests/test_gdn_interpret.py); on-hardware equivalence additionally
    # runs in bench.py and tests/test_gdn_tpu.py per TPU window.
    m, c = x2d.shape
    tile_m = 512 if m >= 512 else _round_up(max(m, 8), 8)
    m_pad = _round_up(m, tile_m)
    c_pad = _round_up(c, 128)
    xp = jnp.pad(x2d, ((0, m_pad - m), (0, c_pad - c)))
    # pad gamma with identity-ish zeros; beta pad = 1 to keep rsqrt finite
    gp = jnp.pad(gamma.astype(jnp.float32), ((0, c_pad - c), (0, c_pad - c)))
    bp = jnp.pad(beta.astype(jnp.float32), (0, c_pad - c), constant_values=1.0)
    bp = bp.reshape(1, c_pad)

    grid = (m_pad // tile_m,)
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((m_pad, c_pad), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * c_pad * c_pad + 4 * m_pad * c_pad,
            bytes_accessed=(2 * m_pad * c_pad + c_pad * c_pad) * 4,
            transcendentals=m_pad * c_pad,
        ),
        interpret=interpret,
    )(xp, gp, bp)
    return out[:m, :c]


def _use_pallas() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gdn2d(x2d, gamma, beta, inverse):
    if _use_pallas():
        return _gdn_pallas(x2d, gamma, beta, inverse)
    return _gdn_reference(x2d, gamma, beta, inverse)


def _gdn2d_fwd(x2d, gamma, beta, inverse):
    return _gdn2d(x2d, gamma, beta, inverse), (x2d, gamma, beta)


def _gdn2d_bwd(inverse, res, g):
    x, gamma, beta = res
    x = x.astype(jnp.float32)
    g = g.astype(jnp.float32)
    x2 = x * x
    norm = x2 @ gamma + beta[None, :]
    if inverse:
        # y = x * norm^{1/2}
        s = jnp.sqrt(norm)
        dy_dnorm = 0.5 * x / s  # per-element partial wrt norm
        dx_direct = g * s
    else:
        # y = x * norm^{-1/2}
        s = jax.lax.rsqrt(norm)
        dy_dnorm = -0.5 * x * s / norm
        dx_direct = g * s
    gn = g * dy_dnorm  # dL/dnorm
    dbeta = jnp.sum(gn, axis=0)
    dgamma = x2.T @ gn
    dx = dx_direct + 2.0 * x * (gn @ gamma.T)
    return dx.astype(res[0].dtype), dgamma, dbeta


_gdn2d.defvjp(_gdn2d_fwd, _gdn2d_bwd)


def gdn(x: jax.Array, gamma: jax.Array, beta: jax.Array, inverse: bool = False) -> jax.Array:
    """Apply (I)GDN over the channel axis of an NHWC tensor (or [..., C])."""
    c = x.shape[-1]
    lead = x.shape[:-1]
    y = _gdn2d(x.reshape(-1, c), gamma, beta, inverse)
    return y.reshape(*lead, c)
