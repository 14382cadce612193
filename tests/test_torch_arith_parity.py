"""Torch arithmetic-parity for the weight converters (VERDICT r2 item 2).

The converter tests in test_weight_converters.py prove key/shape/finite
only; this file upgrades the evidence to NUMERICAL equality: each pinned
architecture's building blocks are re-implemented in ~100 lines of torch
functional code STRAIGHT FROM THE DETECTRON2 SPEC (ref compressai_vision/
model_wrappers/detectron2.py:96-147 wraps GeneralizedRCNN; block semantics:
caffe-style stride-in-1x1 bottlenecks, FrozenBN eps 1e-5, FPN nearest
top-down; JDE darknet conv-BN(eps 1e-4)-leaky(0.1)), fed the SAME random
manifest-built weights as the converted Flax halves, and outputs must agree
to fp32 tolerance. This catches transposed axes, stride placement, BN eps,
padding modes, flatten order, and deconv kernel conventions — two real
bugs (box-head fc1 flatten order, mask-head deconv layout+flip) were found
by exactly this test and fixed in torch_weights.py.
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lmsfc_tpu.models.wrappers.manifest import STAGE_BLOCKS, d2_torch_manifest
from lmsfc_tpu.models.wrappers.torch_weights import (
    _convbn,
    load_detectron2_weights,
)

tt = lambda a: torch.from_numpy(np.asarray(a))  # noqa: E731


def he_synth_sd(manifest, seed=0):
    """Manifest-shaped random weights with He scaling so activations stay
    O(1) through 50 layers (synth_d2_state_dict's flat 0.05 scale decays
    to denormals, swamping a relative comparison)."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in manifest.items():
        if k.endswith("running_var"):
            sd[k] = rng.uniform(0.8, 1.2, shape).astype(np.float32)
        elif k.endswith("running_mean"):
            sd[k] = rng.normal(0, 0.1, shape).astype(np.float32)
        elif ".norm.weight" in k:
            sd[k] = rng.uniform(0.7, 1.3, shape).astype(np.float32)
        elif k.endswith("bias") or ".norm." in k:
            sd[k] = rng.normal(0, 0.05, shape).astype(np.float32)
        elif len(shape) == 4:
            fan_in = shape[1] * shape[2] * shape[3]
            sd[k] = rng.normal(0, np.sqrt(2.0 / fan_in), shape).astype(np.float32)
        elif len(shape) == 2:
            sd[k] = rng.normal(0, np.sqrt(2.0 / shape[1]), shape).astype(np.float32)
        else:
            sd[k] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


# ---------------- torch reference blocks (D2 spec, test-local) ----------------


def t_bn(sd, p, x, eps=1e-5):
    w, b, m, v = (tt(sd[f"{p}.{s}"])[None, :, None, None]
                  for s in ("weight", "bias", "running_mean", "running_var"))
    return (x - m) / torch.sqrt(v + eps) * w + b


def t_convbn(sd, p, x, stride=1, relu=True, groups=1):
    w = tt(sd[f"{p}.weight"])
    y = F.conv2d(x, w, None, stride=stride, padding=w.shape[-1] // 2, groups=groups)
    y = t_bn(sd, f"{p}.norm", y)
    return F.relu(y) if relu else y


def t_bottleneck(sd, p, x, stride, groups=1):
    sc = (t_convbn(sd, f"{p}.shortcut", x, stride, relu=False)
          if f"{p}.shortcut.weight" in sd else x)
    if groups == 1:  # caffe/MSRA: stride in the first 1x1
        y = t_convbn(sd, f"{p}.conv1", x, stride)
        y = t_convbn(sd, f"{p}.conv2", y, 1)
    else:  # X-101: stride in the grouped 3x3
        y = t_convbn(sd, f"{p}.conv1", x, 1)
        y = t_convbn(sd, f"{p}.conv2", y, stride, groups=groups)
    y = t_convbn(sd, f"{p}.conv3", y, 1, relu=False)
    return F.relu(y + sc)


def t_backbone(sd, x, depth=50, groups=1):
    bu = "backbone.bottom_up"
    y = t_convbn(sd, f"{bu}.stem.conv1", x, 2)
    y = F.max_pool2d(y, 3, 2, 1)
    feats = {}
    for si, (stage, n) in enumerate(
        zip(("res2", "res3", "res4", "res5"), STAGE_BLOCKS[depth])
    ):
        for b in range(n):
            y = t_bottleneck(sd, f"{bu}.{stage}.{b}", y,
                             stride=(2 if (b == 0 and si > 0) else 1),
                             groups=groups)
        feats[stage] = y
    return feats


def t_fpn(sd, feats):
    lats = [F.conv2d(feats[s], tt(sd[f"backbone.fpn_lateral{i}.weight"]),
                     tt(sd[f"backbone.fpn_lateral{i}.bias"]))
            for i, s in zip(range(2, 6), ("res2", "res3", "res4", "res5"))]
    merged = [None] * 4
    merged[3] = lats[3]
    for i in (2, 1, 0):
        merged[i] = lats[i] + F.interpolate(merged[i + 1], scale_factor=2.0,
                                            mode="nearest")
    return {f"p{i+2}": F.conv2d(merged[i], tt(sd[f"backbone.fpn_output{i+2}.weight"]),
                                tt(sd[f"backbone.fpn_output{i+2}.bias"]), padding=1)
            for i in range(4)}


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def convert(tmp_path, sd, **kw):
    p = tmp_path / "sd.pkl"
    with open(p, "wb") as f:
        pickle.dump({"model": sd}, f)
    return load_detectron2_weights(p, **kw)


TOL = 2e-5  # fp32: different conv algorithms (XLA vs oneDNN), ~50 layers


class TestR50Parity:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        manifest = d2_torch_manifest(with_mask=True, depth=50)
        sd = he_synth_sd(manifest, seed=3)
        bb, p2 = convert(tmp_path_factory.mktemp("w"), sd, with_mask=True, depth=50)
        x = np.random.default_rng(7).normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
        return sd, bb, p2, x

    def test_backbone_fpn(self, setup):
        sd, bb, _, x = setup
        from lmsfc_tpu.models.resnet_fpn import ResNetFPN

        with torch.no_grad():
            tp = t_fpn(sd, t_backbone(sd, tt(x)))
        jp = ResNetFPN(depth=50).apply(
            {"params": bb}, np.transpose(x, (0, 2, 3, 1)),
            method=ResNetFPN.pyramid_no_p6,
        )
        for k in ("p2", "p3", "p4", "p5"):
            assert rel_err(nchw(jp[k]), tp[k].numpy()) < TOL, k

    def test_box_head_flatten_order(self, setup):
        """fc1 consumes torch's (C,7,7)-major flatten; the NHWC head
        flattens (7,7,C) — the converter must permute fc1's input dim."""
        sd, _, p2, _ = setup
        from lmsfc_tpu.models.rcnn_heads import BoxHead

        roi = np.random.default_rng(11).normal(0, 1, (4, 256, 7, 7)).astype(np.float32)
        with torch.no_grad():
            t = F.relu(F.linear(tt(roi.reshape(4, -1)),
                                tt(sd["roi_heads.box_head.fc1.weight"]),
                                tt(sd["roi_heads.box_head.fc1.bias"])))
            t = F.relu(F.linear(t, tt(sd["roi_heads.box_head.fc2.weight"]),
                                tt(sd["roi_heads.box_head.fc2.bias"])))
            t_scores = F.linear(t, tt(sd["roi_heads.box_predictor.cls_score.weight"]),
                                tt(sd["roi_heads.box_predictor.cls_score.bias"]))
            t_deltas = F.linear(t, tt(sd["roi_heads.box_predictor.bbox_pred.weight"]),
                                tt(sd["roi_heads.box_predictor.bbox_pred.bias"]))
        j_scores, j_deltas = BoxHead().apply(
            {"params": p2["box_head"]}, np.transpose(roi, (0, 2, 3, 1))
        )
        assert rel_err(j_scores, t_scores.numpy()) < TOL
        assert rel_err(j_deltas, t_deltas.numpy()) < TOL

    def test_mask_head_deconv(self, setup):
        """torch ConvTranspose2d (in,out,kh,kw), kernel applied flipped
        relative to flax ConvTranspose — the converter must transpose AND
        flip."""
        sd, _, p2, _ = setup
        from lmsfc_tpu.models.rcnn_heads import MaskHead

        roi = np.random.default_rng(13).normal(0, 1, (3, 256, 14, 14)).astype(np.float32)
        with torch.no_grad():
            m = tt(roi)
            for i in range(1, 5):
                m = F.relu(F.conv2d(m, tt(sd[f"roi_heads.mask_head.mask_fcn{i}.weight"]),
                                    tt(sd[f"roi_heads.mask_head.mask_fcn{i}.bias"]),
                                    padding=1))
            m = F.relu(F.conv_transpose2d(m, tt(sd["roi_heads.mask_head.deconv.weight"]),
                                          tt(sd["roi_heads.mask_head.deconv.bias"]),
                                          stride=2))
            t_mask = F.conv2d(m, tt(sd["roi_heads.mask_head.predictor.weight"]),
                              tt(sd["roi_heads.mask_head.predictor.bias"]))
        j_mask = MaskHead().apply(
            {"params": p2["mask_head"]}, np.transpose(roi, (0, 2, 3, 1))
        )
        assert rel_err(nchw(j_mask), t_mask.numpy()) < TOL

    def test_rpn_head(self, setup):
        sd, _, p2, _ = setup
        from lmsfc_tpu.models.rcnn_heads import RPNHead

        f = np.random.default_rng(17).normal(0, 1, (1, 256, 16, 24)).astype(np.float32)
        rpn = "proposal_generator.rpn_head"
        with torch.no_grad():
            t = F.relu(F.conv2d(tt(f), tt(sd[f"{rpn}.conv.weight"]),
                                tt(sd[f"{rpn}.conv.bias"]), padding=1))
            t_obj = F.conv2d(t, tt(sd[f"{rpn}.objectness_logits.weight"]),
                             tt(sd[f"{rpn}.objectness_logits.bias"]))
            t_del = F.conv2d(t, tt(sd[f"{rpn}.anchor_deltas.weight"]),
                             tt(sd[f"{rpn}.anchor_deltas.bias"]))
        logits, regs = RPNHead().apply(
            {"params": p2["rpn_head"]}, [np.transpose(f, (0, 2, 3, 1))]
        )
        assert rel_err(nchw(logits[0]), t_obj.numpy()) < TOL
        assert rel_err(nchw(regs[0]), t_del.numpy()) < TOL


class TestX101GroupedParity:
    def test_grouped_bottleneck(self):
        """X-101 32x8d block: grouped 3x3 carries the stride (not the 1x1).
        One block, manifest-shaped weights, converter's _convbn per conv."""
        from lmsfc_tpu.models.resnet_fpn import Bottleneck

        rng = np.random.default_rng(23)
        groups, width, in_ch, out_ch, stride = 32, 256, 64, 256, 2

        def mk_convbn(p, out, inc, k, g=1):
            fan_in = (inc // g) * k * k
            return {
                f"{p}.weight": rng.normal(0, np.sqrt(2.0 / fan_in),
                                          (out, inc // g, k, k)).astype(np.float32),
                f"{p}.norm.weight": rng.uniform(0.7, 1.3, out).astype(np.float32),
                f"{p}.norm.bias": rng.normal(0, 0.05, out).astype(np.float32),
                f"{p}.norm.running_mean": rng.normal(0, 0.1, out).astype(np.float32),
                f"{p}.norm.running_var": rng.uniform(0.8, 1.2, out).astype(np.float32),
            }

        sd = {}
        sd.update(mk_convbn("b.conv1", width, in_ch, 1))
        sd.update(mk_convbn("b.conv2", width, width, 3, g=groups))
        sd.update(mk_convbn("b.conv3", out_ch, width, 1))
        sd.update(mk_convbn("b.shortcut", out_ch, in_ch, 1))

        x = rng.normal(0, 1, (1, in_ch, 16, 16)).astype(np.float32)
        with torch.no_grad():
            t = t_bottleneck(sd, "b", tt(x), stride=stride, groups=groups)

        params = {
            "conv1": _convbn(sd, "b.conv1"),
            "conv2": _convbn(sd, "b.conv2"),
            "conv3": _convbn(sd, "b.conv3"),
            "shortcut": _convbn(sd, "b.shortcut"),
        }
        j = Bottleneck(
            bottleneck_channels=width, out_channels=out_ch, stride=stride,
            has_shortcut=True, groups=groups,
        ).apply({"params": params}, np.transpose(x, (0, 2, 3, 1)))
        assert rel_err(nchw(j), t.numpy()) < TOL


class TestJDEParity:
    def test_conv_bn_leaky(self):
        """Darknet conv + BN(eps 1e-4) + leaky(0.1) vs the converted
        ConvBNLeaky (torch_weights_jde BN folding + OIHW->HWIO)."""
        from lmsfc_tpu.models.darknet import ConvBNLeaky
        from lmsfc_tpu.models.wrappers.torch_weights_jde import _assign

        rng = np.random.default_rng(29)
        out, inc, k, stride = 32, 16, 3, 2
        unit = {
            "kernel": rng.normal(0, np.sqrt(2.0 / (inc * k * k)),
                                 (out, inc, k, k)).astype(np.float32),
            "bn_w": rng.uniform(0.7, 1.3, out).astype(np.float32),
            "bn_b": rng.normal(0, 0.05, out).astype(np.float32),
            "bn_m": rng.normal(0, 0.1, out).astype(np.float32),
            "bn_v": rng.uniform(0.8, 1.2, out).astype(np.float32),
        }
        x = rng.normal(0, 1, (2, inc, 12, 12)).astype(np.float32)
        with torch.no_grad():
            y = F.conv2d(tt(x), tt(unit["kernel"]), None, stride=stride, padding=k // 2)
            y = (y - tt(unit["bn_m"])[None, :, None, None]) / torch.sqrt(
                tt(unit["bn_v"])[None, :, None, None] + 1e-4
            ) * tt(unit["bn_w"])[None, :, None, None] + tt(unit["bn_b"])[None, :, None, None]
            t = F.leaky_relu(y, 0.1)

        import jax

        mod = ConvBNLeaky(out, k, stride)
        init = mod.init(jax.random.key(0), np.transpose(x, (0, 2, 3, 1)))["params"]
        converted = _assign(dict(init), [unit])
        j = mod.apply({"params": converted}, np.transpose(x, (0, 2, 3, 1)))
        assert rel_err(nchw(j), t.numpy()) < TOL
