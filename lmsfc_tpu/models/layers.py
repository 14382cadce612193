"""Building-block layers for the learned codec (Flax, NHWC).

GDNLayer wraps the fused Pallas (I)GDN kernel (`lmsfc_tpu.ops.gdn`) with the
non-negative reparameterization used by compressai.layers.GDN (the reference's
codec layer dependency, SURVEY.md §2.9): params are stored as
sqrt(value + pedestal) and recovered as lower_bound(raw, bound)^2 - pedestal,
keeping beta/gamma positive while remaining smoothly trainable.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.gdn import gdn
from ..ops.math import lower_bound

_REPARAM_OFFSET = 2.0**-18


def _nonneg_init(value_init: Callable) -> Callable:
    pedestal = _REPARAM_OFFSET**2

    def init(key, shape):
        v = value_init(key, shape)
        return jnp.sqrt(jnp.maximum(v, 0.0) + pedestal)

    return init


def _nonneg_value(raw: jax.Array, minimum: float = 0.0) -> jax.Array:
    pedestal = _REPARAM_OFFSET**2
    bound = (minimum + pedestal) ** 0.5
    return lower_bound(raw, bound) ** 2 - pedestal


class GDNLayer(nn.Module):
    """(Inverse) Generalized Divisive Normalization over the channel axis."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channels
        beta_raw = self.param(
            "beta", _nonneg_init(lambda k, s: jnp.ones(s, jnp.float32)), (c,)
        )
        gamma_raw = self.param(
            "gamma",
            _nonneg_init(lambda k, s: self.gamma_init * jnp.eye(c, dtype=jnp.float32)),
            (c, c),
        )
        beta = _nonneg_value(beta_raw, self.beta_min)
        gamma = _nonneg_value(gamma_raw)
        return gdn(x, gamma, beta, inverse=self.inverse)


class ConvBlock(nn.Module):
    """Conv (optionally strided) with optional GDN/IGDN/activation epilogue."""

    features: int
    kernel: int = 5
    stride: int = 1
    gdn: Optional[str] = None  # None | "gdn" | "igdn"
    act: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.gdn == "gdn":
            y = GDNLayer(self.features)(y.astype(jnp.float32)).astype(self.dtype)
        elif self.gdn == "igdn":
            y = GDNLayer(self.features, inverse=True)(y.astype(jnp.float32)).astype(self.dtype)
        if self.act is not None:
            y = self.act(y)
        return y


def resize_to(x: jax.Array, hw: Tuple[int, int], method: str = "nearest") -> jax.Array:
    """Resize NHWC spatial dims to exactly `hw` (static shapes, XLA-friendly)."""
    n, h, w, c = x.shape
    if (h, w) == tuple(hw):
        return x
    return jax.image.resize(x, (n, hw[0], hw[1], c), method=method)


class UpConvBlock(nn.Module):
    """x2-ish upsample to an exact target size: resize + conv (+IGDN).

    Resize-conv instead of transposed conv: identical receptive behaviour,
    no checkerboard artefacts, and exact odd-dimension targets (e.g. SFU p5
    25x42 -> p4 50x84) without output cropping.
    """

    features: int
    kernel: int = 5
    gdn: Optional[str] = None
    act: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
        y = resize_to(x, target_hw)
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(y)
        if self.gdn == "igdn":
            y = GDNLayer(self.features, inverse=True)(y.astype(jnp.float32)).astype(self.dtype)
        elif self.gdn == "gdn":
            y = GDNLayer(self.features)(y.astype(jnp.float32)).astype(self.dtype)
        if self.act is not None:
            y = self.act(y)
        return y
