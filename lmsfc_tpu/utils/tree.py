"""Parameter-tree placement helpers.

A host numpy param tree fed to a jitted function is re-uploaded to the
device on EVERY call — for a full model that is tens to hundreds of MB per
step, which silently dominates wall time whenever the host<->device link is
slower than the compute (measured 40x slowdown of the codec transforms on
the bench link before pinning). Everything that loads weights from disk
(checkpoints, converted torch pickles, npz assets) must pin the tree once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def device_pin(tree):
    """Materialize every leaf of a param tree on the default device (no-op
    for leaves that are already committed jax arrays)."""
    return jax.tree_util.tree_map(jnp.asarray, tree)
