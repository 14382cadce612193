"""Fully-factorized entropy bottleneck (Balle et al. 2018, appendix 6.1).

Re-implements the CompressAI `EntropyBottleneck` contract (the reference's
learned-codec dependency, SURVEY.md §2.9 / examples/vcm/models/
bmshj2018-factorized/model.py:8-10) as a Flax module with a TPU-friendly
layout:

  * per-channel monotone MLP cumulative model c(x) (filters (3,3,3,3)),
    evaluated as batched einsum chains over [C, ...] — tiny matmuls that XLA
    fuses; all likelihood math runs on device inside the jitted train step.
  * training quantization = additive U(-0.5,0.5) noise; eval = round around
    the learned median (straight-through for gradients).
  * `aux_loss` drives the `quantiles` parameter to the tail-mass quantiles.
  * `cdf_table(params)` builds the host-side quantized CDFs consumed by the
    C++ rANS coder (`lmsfc_tpu.native.rans`).

Array layout is NHWC ([..., C]); the reference's torch models are NCHW.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import lower_bound
from ..ops.quant import ste_round
from .cdf import CdfTable

_LIKELIHOOD_BOUND = 1e-9


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        C = self.channels
        filters = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        self._num_layers = len(self.filters) + 1

        matrices, biases, factors = [], [], []
        for i in range(self._num_layers):
            init_m = np.log(np.expm1(1 / scale / filters[i + 1]))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda key, shape, v=init_m: jnp.full(shape, v, jnp.float32),
                    (C, filters[i + 1], filters[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.5, 0.5),
                    (C, filters[i + 1], 1),
                )
            )
            if i < self._num_layers - 1:
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda key, shape: jnp.zeros(shape, jnp.float32),
                        (C, filters[i + 1], 1),
                    )
                )
        self._matrices, self._biases, self._factors = matrices, biases, factors

        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]], jnp.float32),
                (C, 1, 1),
            ).reshape(shape),
            (C, 1, 3),
        )

    # ------------------------------------------------------------------ core
    def _logits_cumulative(self, x: jax.Array, stop_gradient: bool) -> jax.Array:
        """x: [C, 1, N] -> logits of the cumulative at x, same shape."""
        logits = x
        for i in range(self._num_layers):
            m, b = self._matrices[i], self._biases[i]
            if stop_gradient:
                m, b = jax.lax.stop_gradient(m), jax.lax.stop_gradient(b)
            logits = jnp.einsum("cij,cjn->cin", jax.nn.softplus(m), logits) + b
            if i < self._num_layers - 1:
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def _likelihood(self, x: jax.Array) -> jax.Array:
        """x: [C, 1, N] integer-ish samples -> pmf values, stable sign trick."""
        v_upper = self._logits_cumulative(x + 0.5, stop_gradient=False)
        v_lower = self._logits_cumulative(x - 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(v_upper + v_lower))
        return jnp.abs(
            jax.nn.sigmoid(sign * v_upper) - jax.nn.sigmoid(sign * v_lower)
        )

    @property
    def medians(self) -> jax.Array:
        return self.quantiles[:, 0, 1]

    def __call__(
        self, x: jax.Array, training: bool = True, rng: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """x: [..., C] -> (x_hat, likelihoods), both [..., C]."""
        C = x.shape[-1]
        assert C == self.channels, (C, self.channels)
        lead = x.shape[:-1]
        # [C, 1, M]
        xt = x.reshape(-1, C).T[:, None, :]
        medians = jax.lax.stop_gradient(self.medians)[:, None, None]

        if training:
            if rng is None:
                rng = self.make_rng("noise")
            noise = jax.random.uniform(rng, xt.shape, xt.dtype, -0.5, 0.5)
            x_hat_t = xt + noise
        else:
            x_hat_t = ste_round(xt - medians) + medians

        likelihood = self._likelihood(x_hat_t)
        likelihood = lower_bound(likelihood, _LIKELIHOOD_BOUND)

        x_hat = x_hat_t[:, 0, :].T.reshape(*lead, C)
        lk = likelihood[:, 0, :].T.reshape(*lead, C)
        return x_hat, lk

    # ------------------------------------------------------------- aux loss
    def aux_loss(self) -> jax.Array:
        """|c(quantiles) - target| — trains quantiles only (ref CompressAI)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        target = float(np.log(2.0 / self.tail_mass - 1.0))
        targets = jnp.array([-target, 0.0, target], jnp.float32)[None, None, :]
        return jnp.sum(jnp.abs(logits - targets))

    # -------------------------------------------------- host-side CDF tables
    def quantize_for_coding(self, x: jax.Array, medians: jax.Array) -> jax.Array:
        """[..., C] -> int32 symbols (pre-offset), round around median."""
        return jnp.round(x - medians[(None,) * (x.ndim - 1)]).astype(jnp.int32)


def build_eb_cdf_table(eb_params: dict, filters=(3, 3, 3, 3), tail_mass: float = 1e-9) -> CdfTable:
    """Build quantized CDF tables from trained EntropyBottleneck params.

    Mirrors CompressAI `EntropyBottleneck.update()`: integer support derived
    from the learned quantiles, pmf sampled from the cumulative model, 16-bit
    quantized with tail mass appended; offsets = -minima.
    """
    p = {k: np.asarray(v) for k, v in eb_params.items()}
    quantiles = p["quantiles"]  # [C,1,3]
    C = quantiles.shape[0]
    medians = quantiles[:, 0, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0)
    maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0)
    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float32)[None, :] + pmf_start[:, None]
    # evaluate cumulative model in numpy (exact mirror of _logits_cumulative)
    num_layers = len(filters) + 1

    def logits_cumulative(x):  # x: [C, 1, N]
        logits = x
        for i in range(num_layers):
            m = np.log1p(np.exp(p[f"matrix_{i}"]))  # softplus
            logits = np.einsum("cij,cjn->cin", m, logits) + p[f"bias_{i}"]
            if i < num_layers - 1:
                logits = logits + np.tanh(p[f"factor_{i}"]) * np.tanh(logits)
        return logits

    xs = samples[:, None, :]  # [C,1,N]
    upper = logits_cumulative(xs + 0.5)
    lower = logits_cumulative(xs - 0.5)
    sign = -np.sign(upper + lower)
    pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))[:, 0, :]

    # tail mass outside the modeled support (at the per-channel support ends)
    tails = np.zeros(C, dtype=np.float64)
    for c in range(C):
        L = int(pmf_length[c])
        tails[c] = _sigmoid(lower[c, 0, 0]) + _sigmoid(-upper[c, 0, L - 1])

    pmf_rows = pmf.astype(np.float64)
    return CdfTable.from_pmfs(pmf_rows, pmf_length, tails, -minima)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def eb_build_indexes(shape: Tuple[int, ...], channels: int) -> np.ndarray:
    """Index = channel id, broadcast over leading/spatial dims ([..., C])."""
    idx = np.arange(channels, dtype=np.int32)
    return np.broadcast_to(idx, shape).copy()
