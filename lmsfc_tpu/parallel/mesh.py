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
