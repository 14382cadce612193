"""Jitted RD train step, sharded over a data-parallel mesh via NamedSharding.

Replaces the (absent) torch training loop of the reference fork with the TPU
recipe: params/opt-state replicated, batch sharded on the `dp` mesh axis, XLA
inserts the gradient all-reduce. Quantile parameters of the entropy
bottleneck are trained by the auxiliary loss only (CompressAI's two-optimizer
split, realized here through stop_gradient structure + a single optimizer).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lmsfc import LMSFCv2
from .rd import rd_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def create_train_state(
    model: LMSFCv2,
    example_features: Sequence[jax.Array],
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    seed: int = 0,
    freeze: Sequence[str] = (),
) -> TrainState:
    """freeze: top-level param-tree keys whose subtrees get zero updates —
    e.g. freeze=('base',) trains ONLY the temporal predictor against a
    donor intra model grafted into params['base'] (rate-only conditional-
    entropy training: with the transforms frozen, the distortion term has
    no gradient path to the predictor and the bpp term is what trains it)."""
    rngs = {"params": jax.random.key(seed), "noise": jax.random.key(seed + 1)}
    variables = model.init(rngs, list(example_features), training=True)
    params = variables["params"]
    freeze_set = set(freeze)

    # quantiles (aux) get a higher LR, mirroring CompressAI's aux optimizer
    def label_fn(tree):
        def lbl(path, _):
            if path and getattr(path[0], "key", None) in freeze_set:
                return "frozen"
            if any(getattr(p, "key", None) == "quantiles" for p in path):
                return "aux"
            return "main"

        return jax.tree_util.tree_map_with_path(lbl, tree)

    # global-norm clip mirrors CompressAI's clip_max_norm=1.0 training recipe
    # (keeps early RD steps stable when the distortion term spikes)
    tx = optax.multi_transform(
        {
            "main": optax.chain(
                optax.clip_by_global_norm(1.0), optax.adam(learning_rate)
            ),
            "aux": optax.adam(aux_learning_rate),
            "frozen": optax.set_to_zero(),
        },
        label_fn,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(
    model: LMSFCv2,
    lmbda: float,
    mesh: Optional[Mesh] = None,
    finest_stride: int = 4,
    proxy_fn: Optional[Callable] = None,
    proxy_weight: float = 0.0,
    shard_spatial: bool = False,
    shard_channels: bool = False,
    lmbdas: Optional[Sequence[float]] = None,
    device_sampler: Optional[Callable] = None,
) -> Callable:
    """Returns jitted (state, features, rng) -> (state, metrics).

    features: list of NHWC levels (finest first), batch axis sharded on `dp`
    when a mesh is given. proxy_fn (optional): a frozen task head (e.g. the
    RPN maps from FasterRCNNFPN.proxy_fn()) adding a task-proxy distortion
    term — the TPU realization of the reference's
    `deeper_features_for_accuracy_proxy` hook (base_wrapper.py:55-59).
    lmbdas (optional, gain-unit models): one lambda per rate point; each
    step samples a rate index and trains that operating point.
    device_sampler (optional, from data.device_crop_sampler): `features`
    is then the FULL HBM-resident dump set ([N,H,W,C] per level) and each
    step crops its batch on device — no per-step host transfer.
    """
    multi_rate = lmbdas is not None and getattr(model, "num_rates", 0) > 0
    if multi_rate:
        assert len(lmbdas) == model.num_rates, (len(lmbdas), model.num_rates)
        lmbda_arr = jnp.asarray(list(lmbdas), jnp.float32)

    def step(state: TrainState, features, rng):
        if device_sampler is not None:
            rng_crop, rng = jax.random.split(rng)
            features = device_sampler(list(features), rng_crop)

        def loss_fn(params):
            if multi_rate:
                rng_rate, rng_noise = jax.random.split(rng)
                rate_idx = jax.random.randint(rng_rate, (), 0, model.num_rates)
                out = model.apply(
                    {"params": params}, list(features), training=True,
                    rate_idx=rate_idx, rngs={"noise": rng_noise},
                )
                losses = rd_loss(
                    out, list(features), lmbda_arr[rate_idx],
                    finest_stride=finest_stride,
                )
                losses["rate_idx"] = rate_idx
            else:
                out = model.apply(
                    {"params": params}, list(features), training=True,
                    rngs={"noise": rng},
                )
                losses = rd_loss(out, list(features), lmbda, finest_stride=finest_stride)
            aux = model.apply({"params": params}, method=type(model).aux_loss)
            total = losses["loss"] + aux
            metrics = {**losses, "aux": aux}
            if proxy_fn is not None and proxy_weight > 0:
                p_ref = proxy_fn([jax.lax.stop_gradient(f) for f in features])
                p_hat = proxy_fn(out["features_hat"])
                proxy = sum(
                    jnp.mean((a - b) ** 2) for a, b in zip(p_ref, p_hat)
                ) / len(p_ref)
                total = total + proxy_weight * proxy
                metrics["proxy"] = proxy
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    if shard_channels:
        # channel tensor-parallelism: the CALLER device_puts state/batch with
        # parallel.mesh.channel_tp_shardings / dp batch shardings; leaving
        # in_shardings open lets GSPMD propagate the tp layout through the
        # transforms (conv outputs channel-sharded, GDN/channel reductions
        # become psums) instead of forcing replication at the boundary.
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    # batch on dp; optionally also shard the height axis on tp (spatial /
    # sequence-parallel analog — GSPMD inserts conv halo exchanges)
    batch_sharding = NamedSharding(mesh, P("dp", "tp") if shard_spatial else P("dp"))
    # shardings per-argument: state replicated, features dp-sharded, rng replicated
    return jax.jit(
        step,
        in_shardings=(repl, batch_sharding, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
