"""Device mesh construction and sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2.11); this is the
green-field TPU equivalent: a `jax.sharding.Mesh` over ICI with named axes

  dp — data parallel (training batch / eval frame axis)
  tp — tensor parallel (reserved for sharding codec transforms over channels)

XLA inserts all collectives from the shardings; there is no hand-written
communication anywhere in the training path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count({n})"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_along(mesh: Mesh, axis: str = "dp", dim: int = 0) -> NamedSharding:
    spec = [None] * (dim + 1)
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def channel_tp_shardings(tree, mesh: Mesh):
    """Tensor-parallel sharding tree for codec params (and optimizer state).

    Conv kernels (HWIO) are sharded over their OUTPUT-channel axis on `tp`;
    everything else stays replicated and GSPMD propagates: activations come
    out channel-sharded after each conv, and cross-channel reductions (GDN's
    sum over channels, the hyper bottleneck) become psums over ICI. Apply
    with jax.device_put to any pytree whose leaves mirror param shapes
    (TrainState included — Adam moments share the kernel shapes)."""
    tp = mesh.shape["tp"]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 4 and shape[-1] % tp == 0:
            return NamedSharding(mesh, P(None, None, None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)
