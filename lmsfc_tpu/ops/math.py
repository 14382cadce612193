"""Bound ops with straight-through-style gradients.

`lower_bound` / `upper_bound` reproduce the gradient semantics of the
CompressAI `LowerBound` autograd op used throughout its entropy models (ref
SURVEY.md §2.9): the gradient passes through when the input is inside the
bound OR when it would move the input back inside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jax.Array, bound) -> jax.Array:
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


@jax.custom_vjp
def upper_bound(x: jax.Array, bound) -> jax.Array:
    return jnp.minimum(x, bound)


def _ub_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _ub_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0), None)


upper_bound.defvjp(_ub_fwd, _ub_bwd)
