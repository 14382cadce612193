"""JDE-1088x608 tracking wrapper (NN-Part1 / NN-Part2) in JAX + host tracker.

Re-creation of compressai_vision/model_wrappers/jde.py:62-516: NN-Part1
captures Darknet features at the configured split layers (TVD {36,61,74},
HiEve {105,90,75} — ref cfgs/vision_model/default.yaml:24-34); NN-Part2
resumes the network from injected features, decodes the 54264 YOLO/embedding
proposals, confidence-filters + NMS + rescales coords to the original frame
(ref jde.py:206-260), and feeds the sequential host-side JDE tracker
(lmsfc_tpu.tracking). Device compute is jitted per geometry; tracker state
persists across the sequence with per-sequence reset.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import register_vision_model
from ...tracking import JDETracker
from ..darknet import JDENet, decode_yolo
from .base_wrapper import BaseWrapper

CONF_THRES = 0.5
NMS_THRES = 0.4
# static upper bound on above-threshold proposals handed to the host NMS.
# The reference NMS-filters the full conf-thresholded set (ref jde.py:206-260)
# with no cap; transferring all 54264 proposals (+512-d embeddings) off-device
# every frame is ~112MB, so the device keeps only above-threshold candidates
# via masked top-k. If a frame saturates the bound, the wrapper falls back to
# the exact full-set path for that frame — semantics match the reference for
# every input.
CANDIDATES_K = 1024
# YOLO proposal count at the nominal 1088x608 input (ref jde.py:206-208)
N_PROPOSALS_1088x608 = 54264


@register_vision_model("jde_1088x608")
class JDE1088x608(BaseWrapper):
    def __init__(
        self,
        splits: Sequence[int] = (36, 61, 74),
        frame_rate: int = 30,
        weights: Optional[str] = None,
        conf_thres: float = CONF_THRES,
        nms_thres: float = NMS_THRES,
        candidates_k: int = CANDIDATES_K,
        **kwargs,
    ):
        self.net = JDENet()
        self.split_ids = tuple(sorted(splits))
        self.backbone_split = self.split_ids == (36, 61, 74)
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self.candidates_k = int(candidates_k)
        self.tracker = JDETracker(frame_rate=frame_rate)
        self._jit_cache: Dict = {}
        self._total_props: Dict = {}  # shapes -> decoded proposal count
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        self._params = self.net.init(jax.random.key(0), x)["params"]
        if weights and not Path(weights).exists():
            # see FasterRCNNFPN._init_params: silent random fallback once
            # cost a round's accuracy artifact
            raise FileNotFoundError(f"JDE weights not found: {weights}")
        if weights and Path(weights).exists():
            from ...utils.tree import device_pin

            if str(weights).endswith(".npz"):
                # native head-only checkpoint (scripts/train_dummy_jde_head
                # .py): the YOLO/embedding head is noise-distilled while the
                # backbone stays the fixed-seed init the feature codec's
                # training dumps come from
                from flax.traverse_util import unflatten_dict

                loaded = np.load(weights)
                head = unflatten_dict(
                    {tuple(k.split("/")): loaded[k] for k in loaded.files}
                )
                self._params = device_pin({**self._params, "head": head})
            else:
                from .torch_weights_jde import load_jde_weights

                # pin the converted numpy tree once (utils/tree.py: a host
                # tree re-uploads the full weight set on every jitted call)
                self._params = device_pin(load_jde_weights(weights, self._params))

    @property
    def split_layer_list(self) -> List[str]:
        return [f"l{i}" for i in self.split_ids]

    def reset(self) -> None:
        """Per-sequence tracker reset (ref jde.py:107-113)."""
        self.tracker.reset()

    # ------------------------------------------------------------ NN-Part1
    def _nn1_fn(self, shape):
        key = ("nn1", shape)
        if key not in self._jit_cache:
            method = JDENet.features_backbone if self.backbone_split else JDENet.features_head

            @jax.jit
            def fn(params, x):
                return self.net.apply({"params": params}, x, method=method)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def input_to_features(self, x: List[Dict], device: str = "tpu") -> Dict:
        sample = x[0]
        img = np.asarray(sample["image"], np.float32)  # CHW RGB /255
        nhwc = jnp.asarray(np.transpose(img, (1, 2, 0))[None])
        feats = self._nn1_fn(nhwc.shape)(self._params, nhwc)
        data = {k: jnp.transpose(v, (0, 3, 1, 2)) for k, v in feats.items()}
        return {
            "data": data,
            "org_input_size": sample["org_input_size"],
            "input_size": [nhwc.shape[1:3]],
            "ratio": sample.get("ratio", 1.0),
            "pad": sample.get("pad", (0.0, 0.0)),
            "frame_id": sample.get("frame_id", 0),
        }

    # ------------------------------------------------------------ NN-Part2
    def _decode_all(self, params, feats):
        """Full proposal decode: boxes/confs/embs over every YOLO cell."""
        method = (
            JDENet.outputs_from_backbone if self.backbone_split else JDENet.outputs_from_head
        )
        out = self.net.apply({"params": params}, feats, method=method)
        boxes, confs, embs = [], [], []
        for stride, (pred, emb) in out.items():
            b, c, e = decode_yolo(pred, emb, int(stride))
            boxes.append(b)
            confs.append(c)
            embs.append(e)
        return (
            jnp.concatenate(boxes),
            jnp.concatenate(confs),
            jnp.concatenate(embs),
        )

    def _nn2_fn(self, shapes):
        """Jitted NN-Part2, vmapped over the frame axis (the tracker is the
        only sequential part; the network resumes for all frames at once).

        The host receives every above-threshold proposal (as the reference's
        full-set NMS does, ref jde.py:206-260), selected on device by
        threshold-masked top-k into a static candidates_k buffer; padding
        entries carry conf=-1. A saturated buffer falls back to
        _nn2_full_fn in features_to_output."""
        key = ("nn2", shapes, self.candidates_k)
        if key not in self._jit_cache:
            conf_thres = self.conf_thres

            def single(params, feats):
                feats = {k: v[None] for k, v in feats.items()}
                boxes, confs, embs = self._decode_all(params, feats)
                # static at trace time: total decoded proposals for this
                # geometry (54264 at the nominal 1088x608, ref jde.py:206-208)
                self._total_props[shapes] = int(confs.shape[0])
                masked = jnp.where(confs >= conf_thres, confs, -1.0)
                k = min(self.candidates_k, confs.shape[0])
                top_c, top_i = jax.lax.top_k(masked, k)
                return boxes[top_i], top_c, embs[top_i]

            @jax.jit
            def fn(params, feats_batched):
                return jax.vmap(single, in_axes=(None, 0))(params, feats_batched)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _nn2_full_fn(self, shapes):
        """Exact fallback: ALL proposals for one frame (no candidate cap)."""
        key = ("nn2full", shapes)
        if key not in self._jit_cache:

            @jax.jit
            def fn(params, feats):
                return self._decode_all(params, feats)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def features_to_output(self, x: Dict, device: str = "tpu") -> List[List[Dict]]:
        # no host cast on the pyramid: decoded features are DEVICE-RESIDENT
        # (jnp.asarray is a no-op there; a single upload for numpy input)
        data = {k: jnp.transpose(jnp.asarray(v), (0, 2, 3, 1)) for k, v in x["data"].items()}
        n = next(iter(data.values())).shape[0]
        shapes = tuple(v.shape[1:] for v in data.values())
        fn = self._nn2_fn(shapes)
        # one batched download (separate np.asarray = one link RTT each)
        boxes, confs, embs = jax.device_get(fn(self._params, data))

        # the nominal JDE geometry must decode exactly 54264 proposals
        # (ref asserts this, jde.py:206-208); count recorded at trace time
        in_h, in_w = x.get("input_size", [(0, 0)])[0]
        if (in_h, in_w) == (608, 1088):
            total = self._total_props.get(shapes)
            assert total == N_PROPOSALS_1088x608, (
                f"expected {N_PROPOSALS_1088x608} proposals at 1088x608, "
                f"decoded {total}"
            )

        outputs = []
        for i in range(n):
            b, c, e = boxes[i], confs[i], embs[i]
            saturated = (
                c.shape[0] == self.candidates_k
                and int(np.sum(c >= self.conf_thres)) == self.candidates_k
            )
            if saturated:
                # candidate buffer saturated: this frame may have more
                # above-threshold proposals — redo exactly, uncapped
                full = self._nn2_full_fn(shapes)
                fb, fc, fe = full(
                    self._params, {k2: v[i : i + 1] for k2, v in data.items()}
                )
                b, c, e = jax.device_get((fb, fc, fe))
            outputs.append(self._track_frame(b, c, e, x))
        return outputs

    def _track_frame(
        self, boxes_xywh: np.ndarray, confs: np.ndarray, embs: np.ndarray, meta: Dict
    ) -> List[Dict]:
        keep = confs >= self.conf_thres
        boxes_xywh, confs, embs = boxes_xywh[keep], confs[keep], embs[keep]
        # xywh(center) -> tlbr for NMS
        tlbr = np.stack(
            [
                boxes_xywh[:, 0] - boxes_xywh[:, 2] / 2,
                boxes_xywh[:, 1] - boxes_xywh[:, 3] / 2,
                boxes_xywh[:, 0] + boxes_xywh[:, 2] / 2,
                boxes_xywh[:, 1] + boxes_xywh[:, 3] / 2,
            ],
            axis=1,
        )
        keep = _nms_numpy(tlbr, confs, self.nms_thres)
        tlbr, confs, embs = tlbr[keep], confs[keep], embs[keep]

        # undo letterbox: coords -> original frame (ref jde.py scale_coords)
        ratio = meta.get("ratio", 1.0)
        padw, padh = meta.get("pad", (0.0, 0.0))
        tlbr[:, [0, 2]] = (tlbr[:, [0, 2]] - padw) / ratio
        tlbr[:, [1, 3]] = (tlbr[:, [1, 3]] - padh) / ratio
        tlwh = np.stack(
            [tlbr[:, 0], tlbr[:, 1], tlbr[:, 2] - tlbr[:, 0], tlbr[:, 3] - tlbr[:, 1]],
            axis=1,
        )
        tracks = self.tracker.update(tlwh, confs, embs)
        return [
            {"track_id": t.track_id, "tlwh": t.tlwh.tolist(), "score": t.score}
            for t in tracks
        ]

    def forward(self, x):
        feats = self.input_to_features(x)
        return self.features_to_output(feats)


def _nms_numpy(tlbr: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    # a non-finite box (random-init head, saturated decode) can never win —
    # NaN IoU comparisons are always false — but it poisons every suppression
    # row it appears in; drop such rows up front, keeping original indices
    finite = np.isfinite(tlbr).all(axis=1) & np.isfinite(scores)
    if not finite.all():
        idx = np.flatnonzero(finite)
        return idx[_nms_numpy(tlbr[idx], scores[idx], thresh)]
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(tlbr), bool)
    areas = np.maximum(tlbr[:, 2] - tlbr[:, 0], 0) * np.maximum(tlbr[:, 3] - tlbr[:, 1], 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(tlbr[i, 0], tlbr[:, 0])
        yy1 = np.maximum(tlbr[i, 1], tlbr[:, 1])
        xx2 = np.minimum(tlbr[i, 2], tlbr[:, 2])
        yy2 = np.minimum(tlbr[i, 3], tlbr[:, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > thresh
    return np.asarray(keep, np.int64)
