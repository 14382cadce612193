"""OpenImages-Challenge evaluator — the MPEG OIV6 protocol (mAP@0.5IOU).

Re-creation of the reference's OpenImagesChallengeEval
(compressai_vision/evaluators/evaluators.py:96-321) and the numpy OID
evaluation it vendors (evaluators/tf_evaluation_utils/, SURVEY.md §2.7),
without the TF Object-Detection-API dependency:

  * per-class AP at IoU 0.5 only; overall metric `mAP@0.5IOU`
  * image-level verified labels: detections for classes not in the image's
    (positive + negative) verified set are ignored
  * group-of ground-truth boxes: a detection whose intersection-over-area
    w.r.t. a group-of box exceeds 0.5 is ignored (one TP credited per
    group); normal boxes use greedy IoU>=0.5 matching
  * all-point (continuous) precision-recall integration, OID style

digest() accepts boxes in absolute xyxy (wrapper output); the OIV6 protocol's
normalized [ymin,xmin,ymax,xmax] conversion (ref evaluators.py:235-286)
happens internally using the sample's original size.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..registry import register_evaluator
from .base_evaluator import BaseEvaluator


def _iou(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    da = np.prod(np.maximum(d[:, 2:] - d[:, :2], 0), axis=1)
    ga = np.prod(np.maximum(g[:, 2:] - g[:, :2], 0), axis=1)
    union = da[:, None] + ga[None] - inter
    return np.where(union > 0, inter / union, 0.0)


def _ioa(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Intersection over DETECTION area (group-of handling)."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    da = np.prod(np.maximum(d[:, 2:] - d[:, :2], 0), axis=1)
    return np.where(da[:, None] > 0, inter / np.maximum(da[:, None], 1e-12), 0.0)


def _mask_iou(d_masks: List[np.ndarray], g_masks: List[np.ndarray]) -> np.ndarray:
    out = np.zeros((len(d_masks), len(g_masks)))
    for i, dm in enumerate(d_masks):
        for j, gm in enumerate(g_masks):
            inter = np.logical_and(dm, gm).sum()
            union = np.logical_or(dm, gm).sum()
            out[i, j] = inter / union if union else 0.0
    return out


def _mask_ioa(d_masks: List[np.ndarray], g_masks: List[np.ndarray]) -> np.ndarray:
    """Intersection over DETECTION mask area (group-of handling,
    ref tf_evaluation_utils/np_box_mask_list_ops ioa)."""
    out = np.zeros((len(d_masks), len(g_masks)))
    for i, dm in enumerate(d_masks):
        da = dm.sum()
        for j, gm in enumerate(g_masks):
            out[i, j] = np.logical_and(dm, gm).sum() / da if da else 0.0
    return out


@register_evaluator("OIC-EVAL")
class OpenImagesChallengeEval(BaseEvaluator):
    def __init__(self, datacatalog=None, dataset=None, criteria: str = "mAP@0.5IOU",
                 iou_threshold: float = 0.5, task: str = "detection", **kwargs):
        self.iou_threshold = iou_threshold
        # "segmentation": the OIV6 instance-seg protocol (ref evaluators.py:
        # 235-286 + np_box_mask_list_ops) — IoU/IOA computed on masks
        self.task = task
        super().__init__(datacatalog, dataset, criteria, **kwargs)
        self.cat_map = getattr(dataset, "cat_id_to_contiguous", None)

    def reset(self) -> None:
        self._images: List[Dict] = []

    def _gt_mask(self, ann: Dict, height: int, width: int) -> np.ndarray:
        from ..ops.masks import polygons_to_mask, rle_decode

        seg = ann.get("segmentation")
        if seg is None:
            # box-filled mask fallback
            x, y, w, h = [int(round(v)) for v in ann["bbox"]]
            m = np.zeros((height, width), np.uint8)
            m[max(y, 0) : y + h, max(x, 0) : x + w] = 1
            return m
        if isinstance(seg, dict):
            return rle_decode(seg)
        if isinstance(seg, np.ndarray):
            return seg.astype(np.uint8)
        return polygons_to_mask(seg, height, width)

    def digest(self, gt: Any, pred: Any) -> None:
        anns = gt.get("annotations", [])
        org = gt.get("org_input_size", {})
        height = int(org.get("height", 0))
        width = int(org.get("width", 0))
        gt_boxes, gt_cls, gt_group, gt_masks = [], [], [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            gt_boxes.append([x, y, x + w, y + h])
            cid = a["category_id"]
            gt_cls.append(self.cat_map[cid] if self.cat_map else cid)
            gt_group.append(a.get("isgroupof", a.get("IsGroupOf", 0)))
            if self.task == "segmentation":
                gt_masks.append(self._gt_mask(a, height, width))
        verified = gt.get("verified_labels")  # None = all classes evaluated
        rec = {
            "gt_boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "gt_cls": np.asarray(gt_cls, np.int64),
            "gt_group": np.asarray(gt_group, np.int64),
            "verified": None if verified is None else set(verified),
            "det_boxes": np.asarray(pred["boxes"], np.float64).reshape(-1, 4),
            "det_cls": np.asarray(pred["classes"], np.int64).reshape(-1),
            "det_scores": np.asarray(pred["scores"], np.float64).reshape(-1),
        }
        if self.task == "segmentation":
            from ..ops.masks import paste_mask

            det_masks = []
            pmasks = pred.get("masks")
            for i in range(len(rec["det_boxes"])):
                m = np.asarray(pmasks[i])
                if m.shape != (height, width):
                    # 28x28 head output -> full-image binary (D2 postprocess)
                    m = paste_mask(m, rec["det_boxes"][i], height, width)
                det_masks.append(m.astype(bool))
            rec["gt_masks"] = [m.astype(bool) for m in gt_masks]
            rec["det_masks"] = det_masks
        self._images.append(rec)

    def _class_ap(self, cls: int) -> Optional[float]:
        scores, labels = [], []  # label: 1 tp, 0 fp (ignored dets dropped)
        n_gt = 0
        for img in self._images:
            if img["verified"] is not None and cls not in img["verified"]:
                continue
            gsel = img["gt_cls"] == cls
            g = img["gt_boxes"][gsel]
            group = img["gt_group"][gsel].astype(bool)
            dsel = img["det_cls"] == cls
            d = img["det_boxes"][dsel]
            s = img["det_scores"][dsel]
            order = np.argsort(-s)
            d, s = d[order], s[order]
            g_plain, g_group = g[~group], g[group]
            n_gt += len(g_plain) + len(g_group)  # each group counts once

            if self.task == "segmentation":
                gsel_idx = np.nonzero(gsel)[0]
                dsel_idx = np.nonzero(dsel)[0][order]
                gm = [img["gt_masks"][i] for i in gsel_idx]
                gm_plain = [m for m, grp in zip(gm, group) if not grp]
                gm_group = [m for m, grp in zip(gm, group) if grp]
                dm = [img["det_masks"][i] for i in dsel_idx]
                iou = _mask_iou(dm, gm_plain)
                ioa = _mask_ioa(dm, gm_group)
            else:
                iou = _iou(d, g_plain)
                ioa = _ioa(d, g_group)
            taken = np.zeros(len(g_plain), bool)
            group_hit = np.zeros(len(g_group), bool)
            for di in range(len(d)):
                best, best_iou = -1, self.iou_threshold
                for gi in range(len(g_plain)):
                    if not taken[gi] and iou[di, gi] >= best_iou:
                        best, best_iou = gi, iou[di, gi]
                if best >= 0:
                    taken[best] = True
                    scores.append(s[di])
                    labels.append(1)
                    continue
                # group-of: first hit is TP, further hits ignored
                gidx = np.nonzero(ioa[di] >= self.iou_threshold)[0]
                if len(gidx):
                    if not group_hit[gidx[0]]:
                        group_hit[gidx[0]] = True
                        scores.append(s[di])
                        labels.append(1)
                    # else ignored
                    continue
                scores.append(s[di])
                labels.append(0)

        if n_gt == 0:
            return None
        if not scores:
            return 0.0
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        order = np.argsort(-scores, kind="mergesort")
        labels = labels[order]
        tp = np.cumsum(labels == 1)
        fp = np.cumsum(labels == 0)
        recall = tp / n_gt
        precision = tp / np.maximum(tp + fp, 1e-12)
        # all-point integration with monotone envelope (OID metric)
        for i in range(len(precision) - 1, 0, -1):
            precision[i - 1] = max(precision[i - 1], precision[i])
        r_prev = 0.0
        ap = 0.0
        for r, p in zip(recall, precision):
            ap += (r - r_prev) * p
            r_prev = r
        return float(ap)

    def results(self, save_path: Optional[str] = None) -> Dict:
        classes = set()
        for img in self._images:
            classes.update(img["gt_cls"].tolist())
        per_class = {}
        for cls in sorted(classes):
            ap = self._class_ap(int(cls))
            if ap is not None:
                per_class[int(cls)] = ap
        overall = float(np.mean(list(per_class.values()))) if per_class else float("nan")
        out = {
            "mAP@0.5IOU": overall * 100,
            "per_class_AP": {k: v * 100 for k, v in per_class.items()},
        }
        self._dump(out, save_path)
        return out
