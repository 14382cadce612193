"""Mechanical Detectron2-pickle -> Flax param-tree conversion.

Converts the pinned Detectron2 model zoo pickles the reference installs
(scripts/install.sh:103-121: model_final_280758.pkl faster_rcnn_R_50_FPN_3x,
model_final_f10217.pkl mask_rcnn_R_50_FPN_3x) into the param trees of
models/resnet_fpn.py + models/rcnn_heads.py. Frozen BN is folded to
scale/bias: scale = weight/sqrt(var+eps), bias = bias - mean*scale.

Conv kernels: torch OIHW -> flax HWIO. Dense: torch [out,in] -> flax [in,out].
"""

from __future__ import annotations

import pickle
from typing import Dict, Tuple

import numpy as np

_BN_EPS = 1e-5


def _load_pickle(path) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    model = data["model"] if "model" in data else data
    return {k: np.asarray(v) for k, v in model.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fold_bn(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.norm.weight"]
    b = sd[f"{prefix}.norm.bias"]
    mean = sd[f"{prefix}.norm.running_mean"]
    var = sd[f"{prefix}.norm.running_var"]
    scale = w / np.sqrt(var + _BN_EPS)
    return {"scale": scale, "bias": b - mean * scale}


def _convbn(sd: Dict, prefix: str) -> Dict:
    return {"conv": {"kernel": _conv(sd[f"{prefix}.weight"])}, "norm": _fold_bn(sd, prefix)}


def load_detectron2_weights(path, with_mask: bool = False, depth: int = 50) -> Tuple[Dict, Dict]:
    """Returns (backbone_params, part2_params) Flax trees."""
    sd = _load_pickle(path)

    bu = "backbone.bottom_up"
    resnet: Dict = {"stem": _convbn(sd, f"{bu}.stem.conv1")}
    res4_blocks = {50: 6, 101: 23}[depth]
    stage_blocks = {"res2": 3, "res3": 4, "res4": res4_blocks, "res5": 3}
    for stage, n in stage_blocks.items():
        for i in range(n):
            p = f"{bu}.{stage}.{i}"
            block: Dict = {
                "conv1": _convbn(sd, f"{p}.conv1"),
                "conv2": _convbn(sd, f"{p}.conv2"),
                "conv3": _convbn(sd, f"{p}.conv3"),
            }
            if f"{p}.shortcut.weight" in sd:
                block["shortcut"] = _convbn(sd, f"{p}.shortcut")
            resnet[f"{stage}_{i}"] = block

    fpn: Dict = {}
    for i in range(2, 6):
        fpn[f"fpn_lateral{i}"] = {
            "kernel": _conv(sd[f"backbone.fpn_lateral{i}.weight"]),
            "bias": sd[f"backbone.fpn_lateral{i}.bias"],
        }
        fpn[f"fpn_output{i}"] = {
            "kernel": _conv(sd[f"backbone.fpn_output{i}.weight"]),
            "bias": sd[f"backbone.fpn_output{i}.bias"],
        }
    backbone = {"bottom_up": resnet, "fpn": fpn}

    rpn = "proposal_generator.rpn_head"
    part2: Dict = {
        "rpn_head": {
            "conv": {
                "kernel": _conv(sd[f"{rpn}.conv.weight"]),
                "bias": sd[f"{rpn}.conv.bias"],
            },
            "objectness_logits": {
                "kernel": _conv(sd[f"{rpn}.objectness_logits.weight"]),
                "bias": sd[f"{rpn}.objectness_logits.bias"],
            },
            "anchor_deltas": {
                "kernel": _conv(sd[f"{rpn}.anchor_deltas.weight"]),
                "bias": sd[f"{rpn}.anchor_deltas.bias"],
            },
        },
        "box_head": {
            # torch flattens ROI features channel-major (C,7,7); the NHWC
            # BoxHead flattens (7,7,C) — fc1's input dimension must be
            # permuted accordingly (caught by the torch arithmetic-parity
            # test; a pure shape check cannot see this)
            "fc1": {
                "kernel": _dense(
                    sd["roi_heads.box_head.fc1.weight"]
                    .reshape(1024, 256, 7, 7)
                    .transpose(0, 2, 3, 1)
                    .reshape(1024, -1)
                ),
                "bias": sd["roi_heads.box_head.fc1.bias"],
            },
            "fc2": {
                "kernel": _dense(sd["roi_heads.box_head.fc2.weight"]),
                "bias": sd["roi_heads.box_head.fc2.bias"],
            },
            "cls_score": {
                "kernel": _dense(sd["roi_heads.box_predictor.cls_score.weight"]),
                "bias": sd["roi_heads.box_predictor.cls_score.bias"],
            },
            "bbox_pred": {
                "kernel": _dense(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                "bias": sd["roi_heads.box_predictor.bbox_pred.bias"],
            },
        },
    }
    if with_mask:
        mh = "roi_heads.mask_head"
        mask: Dict = {}
        for i in range(1, 5):
            mask[f"mask_fcn{i}"] = {
                "kernel": _conv(sd[f"{mh}.mask_fcn{i}.weight"]),
                "bias": sd[f"{mh}.mask_fcn{i}.bias"],
            }
        # torch ConvTranspose2d weight is (in, out, kh, kw) and applies the
        # kernel as the GRADIENT of a conv (spatially flipped relative to
        # flax ConvTranspose's transpose_kernel=False convention): map to
        # flax (kh, kw, in, out) AND flip both spatial axes (verified
        # exact by the torch arithmetic-parity test)
        dw = sd[f"{mh}.deconv.weight"]
        mask["deconv"] = {
            "kernel": np.transpose(dw, (2, 3, 0, 1))[::-1, ::-1].copy(),
            "bias": sd[f"{mh}.deconv.bias"],
        }
        mask["predictor"] = {
            "kernel": _conv(sd[f"{mh}.predictor.weight"]),
            "bias": sd[f"{mh}.predictor.bias"],
        }
        part2["mask_head"] = mask

    return backbone, part2
