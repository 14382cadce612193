"""Faster/Mask R-CNN R-50 FPN split wrapper (NN-Part1 / NN-Part2) in JAX.

Re-creation of the reference's Detectron2 wrapper
(compressai_vision/model_wrappers/detectron2.py:57-298):

  NN-Part1 `input_to_features`: caffe-BGR normalize -> ResNet-50+FPN ->
      {p2..p5}, p6 DROPPED from the coded features (ref :96-102).
  NN-Part2 `features_to_output`: p6 = maxpool(p5) recomputed, RPN proposals,
      ROIAlign + box head (+ mask head), rescale to original size
      (ref :111-147).

TPU design: both halves are jit-compiled per input geometry (static shapes;
variable-size images are padded to a 32-divisible bucket, with the true
image size carried for clipping/rescale — SURVEY.md §7 hard part 4). Weights
convert mechanically from the Detectron2 pickles pinned by the reference's
installer (scripts/install.sh:103-121) via torch_weights.py; random init
otherwise (architecture validation only).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import register_vision_model
from ..rcnn_heads import (
    BoxHead,
    MaskHead,
    RPNHead,
    box_inference,
    rescale_boxes,
    rpn_proposals,
)
from ..resnet_fpn import ResNetFPN, top_block_p6
from ...ops.roi_align import assign_levels, roi_align_pyramid
from .base_wrapper import BaseWrapper

# Detectron2 caffe-style preprocessing (BGR, mean only)
PIXEL_MEAN_BGR = np.array([103.530, 116.280, 123.675], np.float32)
SIZE_DIVISIBILITY = 32
# random-init (no real weights) feature-range calibration — see _init_params
RANDOM_INIT_FEATURE_GAIN = 1.0 / 20.0


class _RCNNPart2(nn.Module):
    """RPN + ROI heads as one Flax module (single image)."""

    with_mask: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.rpn_head = RPNHead(dtype=self.dtype)
        self.box_head = BoxHead(dtype=self.dtype)
        if self.with_mask:
            self.mask_head = MaskHead(dtype=self.dtype)

    def __call__(
        self,
        pyramid: Sequence[jax.Array],  # [p2..p5] each [1,H,W,256]
        image_hw: Tuple[int, int],
    ) -> Dict[str, jax.Array]:
        p6 = top_block_p6(pyramid[3])
        rpn_feats = list(pyramid) + [p6]
        logits, regs = self.rpn_head(rpn_feats)
        level_shapes = [(f.shape[1], f.shape[2]) for f in rpn_feats]
        boxes, scores = rpn_proposals(logits, regs, level_shapes, image_hw)
        valid = scores > -jnp.inf

        levels = assign_levels(boxes)
        roi_feats = roi_align_pyramid(pyramid, boxes, levels, output_size=7)
        cls_logits, deltas = self.box_head(roi_feats)
        det = box_inference(cls_logits, deltas, boxes, valid, image_hw)

        if self.with_mask:
            mlevels = assign_levels(det["boxes"])
            mfeats = roi_align_pyramid(pyramid, det["boxes"], mlevels, output_size=14)
            mask_logits = self.mask_head(mfeats)  # [100,28,28,K]
            cls = det["classes"]
            det["masks"] = jax.nn.sigmoid(
                jnp.take_along_axis(
                    mask_logits, cls[:, None, None, None], axis=-1
                )[..., 0]
            )
        return det


class _RCNNWrapper(BaseWrapper):
    with_mask = False
    arch_name = "faster_rcnn_R_50_FPN_3x"
    depth = 50
    groups = 1
    width_per_group = 64

    def __init__(
        self,
        weights: Optional[str] = None,
        device: str = "tpu",
        splits: Sequence[str] = ("p2", "p3", "p4", "p5"),
        min_size_test: int = 800,
        max_size_test: int = 1333,
        resize_input: bool = True,
        **kwargs,
    ):
        self.backbone = ResNetFPN(
            depth=self.depth, groups=self.groups, width_per_group=self.width_per_group
        )
        self.part2 = _RCNNPart2(with_mask=self.with_mask)
        self._splits = list(splits)
        # Detectron2 ResizeShortestEdge test-time protocol (min 800/max 1333)
        self.min_size_test = min_size_test
        self.max_size_test = max_size_test
        self.resize_input = resize_input
        self._params_backbone = None
        self._params_part2 = None
        self._weights_path = weights
        self._jit_cache: Dict = {}
        self._init_params()

    # ----------------------------------------------------------- parameters
    def _init_params(self):
        wp = self._weights_path
        if wp and not Path(wp).exists():
            # never fall back to random weights silently: a missing
            # checkpoint once turned a whole accuracy sweep into noise
            # before this raised (round-5 diag, scripts/diag_oiv6.py)
            raise FileNotFoundError(f"vision-model weights not found: {wp}")
        if wp and Path(wp).exists() and not str(wp).endswith(".npz"):
            from ...utils.tree import device_pin
            from .torch_weights import load_detectron2_weights

            self._params_backbone, self._params_part2 = load_detectron2_weights(
                self._weights_path, with_mask=self.with_mask, depth=self.depth
            )
            # converted pickles are numpy trees: pin once or every NN1/NN2
            # call re-uploads the full weight set (utils/tree.py)
            self._params_backbone = device_pin(self._params_backbone)
            self._params_part2 = device_pin(self._params_part2)
            return
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        self._params_backbone = self.backbone.init(jax.random.key(0), x)["params"]
        # calibrate the random init's feature dynamic range to the reference's
        # (SFUHW features span ~[-18, 17], BASELINE.md): un-calibrated
        # He-init ResNet on 0..255-mean-subtracted images emits ~20x larger
        # activations, which destabilizes downstream RD training. The FPN
        # output convs are the last linear op before the split, so scaling
        # their kernel+bias scales every feature level exactly.
        bb = dict(self._params_backbone)
        fpn = dict(bb["fpn"])
        for name in list(fpn.keys()):
            if name.startswith("fpn_output"):
                fpn[name] = jax.tree_util.tree_map(
                    lambda a: a * RANDOM_INIT_FEATURE_GAIN, fpn[name]
                )
        bb["fpn"] = fpn
        self._params_backbone = bb
        pyr = [jnp.zeros((1, 16 // (2**i) + 1, 16 // (2**i) + 1, 256), jnp.float32) for i in range(4)]
        self._params_part2 = self.part2.init(jax.random.key(1), pyr, (64, 64))["params"]
        if wp and Path(wp).exists() and str(wp).endswith(".npz"):
            # native part2-only checkpoint (scripts/train_dummy_oiv6_detector
            # .py): the RPN/ROI heads are overfit-trained while the backbone
            # stays the fixed-seed calibrated random init the feature codec's
            # training dumps were produced from — swapping the backbone would
            # invalidate every committed codec checkpoint
            from flax.traverse_util import unflatten_dict
            from ...utils.tree import device_pin

            loaded = np.load(wp)
            self._params_part2 = device_pin(
                unflatten_dict(
                    {tuple(k.split("/")): loaded[k] for k in loaded.files}
                )
            )

    @property
    def split_layer_list(self) -> List[str]:
        return self._splits

    # ------------------------------------------------------------ NN-Part1
    def expected_input_size(self, org_hw: Tuple[int, int]) -> Tuple[int, int]:
        """Post-resize (pre-padding) size for a given original size — lets
        decode_only runs reconstruct NN2 metadata without running NN1."""
        h, w = org_hw
        if not self.resize_input:
            return h, w
        scale = self.min_size_test / min(h, w)
        if max(h, w) * scale > self.max_size_test:
            scale = self.max_size_test / max(h, w)
        return int(round(h * scale)), int(round(w * scale))

    def resize_shortest_edge(self, img: np.ndarray) -> np.ndarray:
        """Detectron2 test-time resize: shortest edge -> min_size_test,
        capped so the long edge <= max_size_test (hard part 4, SURVEY.md §7:
        sizes then bucket to 32-divisible padded shapes for XLA)."""
        import cv2

        h, w = img.shape[:2]
        scale = self.min_size_test / min(h, w)
        if max(h, w) * scale > self.max_size_test:
            scale = self.max_size_test / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        if (nh, nw) == (h, w):
            return img
        return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)

    def preprocess(self, imgs_bgr: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
        """[N,H,W,3] BGR uint8 -> padded float NHWC + true (H,W)."""
        x = imgs_bgr.astype(np.float32) - PIXEL_MEAN_BGR
        n, h, w, _ = x.shape
        ph = -(-h // SIZE_DIVISIBILITY) * SIZE_DIVISIBILITY
        pw = -(-w // SIZE_DIVISIBILITY) * SIZE_DIVISIBILITY
        if (ph, pw) != (h, w):
            x = np.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        return x, (h, w)

    def _backbone_fn(self, shape):
        key = ("bb", shape)
        if key not in self._jit_cache:

            @jax.jit
            def fn(params, x):
                out = self.backbone.apply({"params": params}, x, method=ResNetFPN.pyramid_no_p6)
                return out

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def input_to_features(self, x: List[Dict], device: str = "tpu") -> Dict:
        """x: list of samples with 'image' [3,H,W] float BGR (0-255 caffe) or
        'image_bgr' HWC uint8. Returns {"data": {p2..p5: [N,C,H,W]}, ...}."""
        imgs = []
        for sample in x:
            img = sample.get("image_bgr")
            if img is None:
                chw = np.asarray(sample["image"])
                img = np.transpose(chw, (1, 2, 0))
            img = np.asarray(img)
            if self.resize_input:
                img = self.resize_shortest_edge(img)
            imgs.append(img)
        batch = np.stack(imgs)
        xpad, (h, w) = self.preprocess(batch)
        fn = self._backbone_fn(xpad.shape)
        pyr = fn(self._params_backbone, jnp.asarray(xpad))
        data = {k: jnp.transpose(v, (0, 3, 1, 2)) for k, v in pyr.items() if k in self._splits}
        return {
            "data": data,
            "input_size": [(h, w)],
            "org_input_size": x[0].get("org_input_size", {"height": h, "width": w}),
        }

    # ------------------------------------------------------------ NN-Part2
    def _part2_fn(self, shapes, image_hw):
        """Jitted NN-Part2, vmapped over the frame axis (all frames of a
        sequence share a geometry, so one compiled program serves the whole
        video and amortizes per-frame dispatch)."""
        key = ("p2", shapes, image_hw)
        if key not in self._jit_cache:

            def single(params, pyramid):
                pyramid = tuple(p[None] for p in pyramid)  # [1,H,W,C] each
                return self.part2.apply({"params": params}, pyramid, image_hw)

            @jax.jit
            def fn(params, pyramid_batched):
                return jax.vmap(single, in_axes=(None, 0))(params, pyramid_batched)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def features_to_output(self, x: Dict, device: str = "tpu") -> List[Dict]:
        data = x["data"]
        h, w = x["input_size"][0]
        org = x.get("org_input_size", {"height": h, "width": w})
        oh, ow = org["height"], org["width"]

        # NO np.asarray on the pyramid: the decoded features are
        # DEVICE-RESIDENT after codec.decode, and a host cast would pay a
        # full download + re-upload per frame; jnp.asarray is a no-op for
        # device arrays and a single upload for numpy (feature-cache) input
        pyr_batched = tuple(
            jnp.transpose(jnp.asarray(data[k]), (0, 2, 3, 1)) for k in self._splits
        )
        n = pyr_batched[0].shape[0]
        fn = self._part2_fn(tuple(p.shape[1:] for p in pyr_batched), (h, w))
        det = fn(self._params_part2, pyr_batched)
        # one batched download for all detection planes (per-key np.asarray
        # pays a link round trip each)
        det = dict(zip(det.keys(), jax.device_get(list(det.values()))))

        # D2 detector_postprocess rescale+clip on HOST numpy: the boxes are
        # already downloaded, and a device round trip for a [N,4] multiply
        # costs two more link RTTs per frame
        scale = np.asarray([ow / w, oh / h, ow / w, oh / h],
                           det["boxes"].dtype)
        results = []
        for i in range(n):
            boxes = det["boxes"][i] * scale
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, ow)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, oh)
            valid = det["valid"][i]
            res = {
                "boxes": boxes[valid],
                "scores": det["scores"][i][valid],
                "classes": det["classes"][i][valid],
                "image_size": (oh, ow),
            }
            if "masks" in det:
                res["masks_28"] = det["masks"][i][valid]
            results.append(res)
        return results

    def deeper_features_for_accuracy_proxy(self, x: Dict) -> Any:
        """RPN objectness/delta maps from features — differentiable task
        proxy for RD training (ref detectron2.py:150-175 uses proposals).

        x: {"data": {p2..p5: [N,C,H,W]}}. Returns list of [N,H,W,A*(1+4)]
        tensors, one per pyramid level (p2..p6).
        """
        data = x["data"]
        pyr = [jnp.transpose(jnp.asarray(data[k]), (0, 2, 3, 1)) for k in self._splits]

        def fn(params, pyramid):
            p6 = top_block_p6(pyramid[3])
            feats = list(pyramid) + [p6]
            logits, regs = RPNHead(dtype=jnp.float32).bind(
                {"params": params["rpn_head"]}
            )(feats)
            return [jnp.concatenate([l, r], axis=-1) for l, r in zip(logits, regs)]

        return fn(self._params_part2, pyr)

    def proxy_fn(self):
        """(features_nhwc_list) -> proxy tensors; jit-friendly closure over
        frozen NN-Part2 params, for use inside the RD train step."""
        params = jax.lax.stop_gradient(self._params_part2["rpn_head"])

        def fn(pyramid_nhwc):
            p6 = top_block_p6(pyramid_nhwc[3])
            feats = list(pyramid_nhwc) + [p6]
            logits, regs = RPNHead(dtype=jnp.float32).bind({"params": params})(feats)
            return [jnp.concatenate([l, r], axis=-1) for l, r in zip(logits, regs)]

        return fn

    def forward(self, x):
        feats = self.input_to_features(x)
        return self.features_to_output(feats)


@register_vision_model("faster_rcnn_R_50_FPN_3x")
class FasterRCNNFPN(_RCNNWrapper):
    with_mask = False
    arch_name = "faster_rcnn_R_50_FPN_3x"


@register_vision_model("mask_rcnn_R_50_FPN_3x")
class MaskRCNNFPN(_RCNNWrapper):
    with_mask = True
    arch_name = "mask_rcnn_R_50_FPN_3x"


@register_vision_model("faster_rcnn_X_101_32x8d_FPN_3x")
class FasterRCNNX101(_RCNNWrapper):
    """ResNeXt-101 32x8d backbone (the OIV6/SFU anchor model family,
    ref detectron2.py:277-298)."""

    with_mask = False
    arch_name = "faster_rcnn_X_101_32x8d_FPN_3x"
    depth = 101
    groups = 32
    width_per_group = 8


@register_vision_model("mask_rcnn_X_101_32x8d_FPN_3x")
class MaskRCNNX101(FasterRCNNX101):
    with_mask = True
    arch_name = "mask_rcnn_X_101_32x8d_FPN_3x"
