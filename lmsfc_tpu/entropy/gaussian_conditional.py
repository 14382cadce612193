"""Conditional Gaussian entropy model (scale hyperprior, Balle et al. 2018).

Re-implements the CompressAI `GaussianConditional` contract (SURVEY.md §2.9):
likelihood of round(y) under N(means, scales^2) integrated over +-1/2, a
64-entry geometric scale table for coding, and host-side quantized-CDF
construction for the rANS coder.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from ..ops.math import lower_bound
from ..ops.quant import ste_round
from .cdf import CdfTable

_LIKELIHOOD_BOUND = 1e-9

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64

SCALES_TABLE = np.exp(
    np.linspace(math.log(SCALES_MIN), math.log(SCALES_MAX), SCALES_LEVELS)
).astype(np.float32)


def _std_cumulative(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc: 0.5 * erfc(-x / sqrt(2))."""
    const = -(2.0**-0.5)
    return 0.5 * jax.lax.erfc(const * x)


class GaussianConditional:
    """Stateless functional model — no learned params of its own."""

    def __init__(self, scale_bound: float = SCALES_MIN, tail_mass: float = 1e-9):
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)

    def __call__(
        self,
        y: jax.Array,
        scales: jax.Array,
        means: Optional[jax.Array] = None,
        training: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (y_hat, likelihoods)."""
        if training:
            assert rng is not None, "training quantization needs an rng"
            noise = jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
            y_hat = y + noise
        else:
            if means is not None:
                y_hat = ste_round(y - means) + means
            else:
                y_hat = ste_round(y)
        likelihood = self._likelihood(y_hat, scales, means)
        return y_hat, lower_bound(likelihood, _LIKELIHOOD_BOUND)

    def _likelihood(
        self, y: jax.Array, scales: jax.Array, means: Optional[jax.Array]
    ) -> jax.Array:
        scales = lower_bound(scales, self.scale_bound)
        values = y - means if means is not None else y
        values = jnp.abs(values)
        upper = _std_cumulative((0.5 - values) / scales)
        lower = _std_cumulative((-0.5 - values) / scales)
        return upper - lower

    # -------------------------------------------------------------- coding
    @staticmethod
    def build_indexes(scales: np.ndarray, table: np.ndarray = SCALES_TABLE) -> np.ndarray:
        """Map each scale to the smallest table entry >= scale (ref CompressAI)."""
        scales = np.maximum(np.asarray(scales, dtype=table.dtype), table[0])
        indexes = np.full(scales.shape, len(table) - 1, dtype=np.int32)
        for s in table[:-1]:
            indexes -= (scales <= s).astype(np.int32)
        return indexes

    @staticmethod
    def build_indexes_device(scales: jax.Array) -> jax.Array:
        """Device (XLA) twin of build_indexes: index = #{table[i] < scale,
        i < 63} == searchsorted(table[:-1], scale, 'left'), identical tie
        semantics to the host loop (entries exactly equal to a scale count as
        covering it). Runs inside the hyper-synthesis jit so encoder and
        decoder derive indexes from the same program's floats."""
        table = jnp.asarray(SCALES_TABLE[:-1])
        return jnp.searchsorted(table, scales, side="left").astype(jnp.uint8)

    def cdf_table(self, table: np.ndarray = SCALES_TABLE) -> CdfTable:
        """Quantized CDFs per table scale (mirror of CompressAI update())."""
        tail = self.tail_mass / 2.0
        multiplier = -float(scipy.special.ndtri(tail))  # standardized quantile
        pmf_center = np.ceil(np.asarray(table, np.float64) * multiplier).astype(np.int64)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        n = len(table)
        samples = np.abs(
            np.arange(max_length, dtype=np.int64)[None, :] - pmf_center[:, None]
        ).astype(np.float64)
        scales = np.asarray(table, np.float64)[:, None]
        upper = _np_std_cumulative((0.5 - samples) / scales)
        lower = _np_std_cumulative((-0.5 - samples) / scales)
        pmf = upper - lower
        tail_mass = 2.0 * _np_std_cumulative(
            (-0.5 - pmf_center.astype(np.float64)[:, None]) / scales
        )[:, 0]
        return CdfTable.from_pmfs(pmf, pmf_length, tail_mass, -pmf_center)


def _np_std_cumulative(x: np.ndarray) -> np.ndarray:
    return 0.5 * scipy.special.erfc(-(2.0**-0.5) * x)
