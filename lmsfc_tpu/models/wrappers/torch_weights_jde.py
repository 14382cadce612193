"""Best-effort JDE (Towards-Realtime-MOT) .pt -> Flax param conversion.

The reference pins `jde.1088x608.uncertainty.pt` (scripts/install.sh:188-190).
The torch checkpoint stores darknet-cfg-ordered Conv2d/BatchNorm tensors;
our Flax tree is structured by stage/branch. Conversion walks both in
topological order and greedily matches by shape, folding BN running stats
into the (scale, bias) pairs of ConvBNLeaky. Mismatches are reported and
left at their initialized values — validate converted models against the
54264-proposal decode before trusting accuracy.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)
_BN_EPS = 1e-4  # darknet convention


def _flatten(tree, prefix=()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    out = []
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict) or hasattr(v, "keys"):
            out.extend(_flatten(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), np.asarray(v)))
    return out


def load_jde_weights(path: str, params: Dict) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    # group torch tensors into (conv_kernel, bn or bias) units in order
    units = []
    keys = list(sd.keys())
    i = 0
    while i < len(keys):
        k = keys[i]
        if k.endswith("conv.weight") or (k.endswith(".weight") and sd[k].ndim == 4):
            unit = {"kernel": sd[k]}
            base = k.rsplit(".", 2)[0]
            for suffix, name in (
                ("batch_norm.weight", "bn_w"), ("batch_norm.bias", "bn_b"),
                ("batch_norm.running_mean", "bn_m"), ("batch_norm.running_var", "bn_v"),
            ):
                kk = f"{base}.{suffix}"
                if kk in sd:
                    unit[name] = sd[kk]
            bias_k = k.replace("weight", "bias")
            if bias_k in sd and sd[bias_k].ndim == 1 and "bn_w" not in unit:
                unit["bias"] = sd[bias_k]
            units.append(unit)
        i += 1

    flat = _flatten(params)
    # our conv kernels in traversal order
    new_params = _assign(params, units)
    return new_params


def _assign(params: Dict, units: List[Dict]) -> Dict:
    """Greedy in-order assignment of torch conv units to flax conv leaves."""
    import copy

    params = copy.deepcopy(
        {k: v for k, v in params.items()}
    )
    unit_iter = iter(units)
    matched, missed = 0, 0

    def walk(node):
        nonlocal matched, missed
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if "conv" in keys and isinstance(node["conv"], dict) and "kernel" in node["conv"]:
            try:
                unit = next(unit_iter)
            except StopIteration:
                missed += 1
                return {k: walk(v) for k, v in node.items()}
            hwio = np.transpose(unit["kernel"], (2, 3, 1, 0))
            if hwio.shape == np.asarray(node["conv"]["kernel"]).shape:
                node["conv"]["kernel"] = hwio
                if "bn_w" in unit and "bn_scale" in node:
                    scale = unit["bn_w"] / np.sqrt(unit["bn_v"] + _BN_EPS)
                    node["bn_scale"] = scale
                    node["bn_bias"] = unit["bn_b"] - unit["bn_m"] * scale
                matched += 1
            else:
                missed += 1
        return {k: walk(v) for k, v in node.items()}

    out = walk(params)
    logger.info(f"jde weight conversion: matched={matched} missed={missed}")
    return out
