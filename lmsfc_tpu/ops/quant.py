"""Quantization ops.

`min_max_normalization` / `min_max_inv_normalization` reproduce the exact
10-bit packing arithmetic of the reference (compressai_vision/codecs/
utils.py:42-52): clamp to [0,1], scale by (2^bitdepth - 1), FLOOR (not round);
mid-level is rounded to nearest. Exact reproduction is required for anchor
number parity (SURVEY.md §7 hard part 5).

`ste_round` / `noise_quantize` are the learned-codec quantizers: hard round
with a straight-through gradient, and additive uniform noise (the training
relaxation of scalar quantization used by the entropy models).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def min_max_normalization(
    x: jax.Array, minv: float, maxv: float, bitdepth: int = 10
) -> Tuple[jax.Array, int]:
    max_num_bins = (2**bitdepth) - 1
    out = jnp.clip((x - minv) / (maxv - minv), 0.0, 1.0)
    mid_level = -minv / (maxv - minv)
    return jnp.floor(out * max_num_bins), int(mid_level * max_num_bins + 0.5)


def min_max_inv_normalization(
    x: jax.Array, minv: float, maxv: float, bitdepth: int = 10
) -> jax.Array:
    out = x / ((2**bitdepth) - 1)
    return out * (maxv - minv) + minv


@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def noise_quantize(x: jax.Array, key: jax.Array) -> jax.Array:
    """Additive U(-0.5, 0.5) noise — differentiable quantization proxy."""
    noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    return x + noise
