"""RD train step for the learned IMAGE codecs (remote-inference family).

Same recipe as the feature-codec trainer (training/train.py) with the
image objective lambda*255^2*MSE + bpp; shards the image batch on `dp`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .rd import rd_image_loss
from .train import TrainState


def create_image_train_state(
    model, example_x: jax.Array, learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3, seed: int = 0,
) -> TrainState:
    rngs = {"params": jax.random.key(seed), "noise": jax.random.key(seed + 1)}
    params = model.init(rngs, example_x, training=True)["params"]

    def label_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "aux"
            if any(getattr(p, "key", None) == "quantiles" for p in path)
            else "main",
            tree,
        )

    tx = optax.multi_transform(
        {"main": optax.adam(learning_rate), "aux": optax.adam(aux_learning_rate)},
        label_fn,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params),
        tx=tx, apply_fn=model.apply,
    )


def make_image_train_step(model, lmbda: float, mesh: Optional[Mesh] = None) -> Callable:
    def step(state: TrainState, x, rng):
        def loss_fn(params):
            out = model.apply({"params": params}, x, training=True, rngs={"noise": rng})
            losses = rd_image_loss(out, x, lmbda)
            aux = model.apply({"params": params}, method=type(model).aux_loss)
            metrics = {**losses, "aux": aux}
            return losses["loss"] + aux, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(repl, dp, repl), out_shardings=(repl, repl),
                   donate_argnums=(0,))
