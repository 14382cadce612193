"""COCO-protocol detection mAP evaluator — numpy, dependency-free.

Stands in for the Detectron2/pycocotools COCOEvaluator the reference wraps
(compressai_vision/evaluators/evaluators.py:59-93); implements the standard
COCOeval protocol: per-class greedy matching at IoU thresholds .5:.05:.95,
101-point interpolated AP, maxDets=100, crowd regions ignored. Reports both
`AP` (mean over IoUs) and `AP50` — the criteria keys the runner selects on
(ref run/eval_split_inference.py:232-271).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..registry import register_evaluator
from .base_evaluator import BaseEvaluator

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _iou_xywh(d: np.ndarray, g: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """IoU of dets [D,4] vs gts [G,4], xywh. For crowd gt: intersection/darea."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    dx1, dy1 = d[:, 0], d[:, 1]
    dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    gx1, gy1 = g[:, 0], g[:, 1]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    ix = np.maximum(
        0, np.minimum(dx2[:, None], gx2[None]) - np.maximum(dx1[:, None], gx1[None])
    )
    iy = np.maximum(
        0, np.minimum(dy2[:, None], gy2[None]) - np.maximum(dy1[:, None], gy1[None])
    )
    inter = ix * iy
    darea = (d[:, 2] * d[:, 3])[:, None]
    garea = (g[:, 2] * g[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), darea, darea + garea - inter)
    return np.where(union > 0, inter / union, 0.0)


@register_evaluator("COCO-EVAL")
class COCOEval(BaseEvaluator):
    """digest(gt_sample, predictions) accumulates; results() computes AP."""

    def __init__(self, datacatalog=None, dataset=None, criteria: str = "AP",
                 task: str = "detection", **kwargs):
        self.task = task  # "detection" | "segmentation" (mask IoU matching)
        super().__init__(datacatalog, dataset, criteria, **kwargs)
        self.cat_map = getattr(dataset, "cat_id_to_contiguous", None)

    def reset(self) -> None:
        # per image: {"image_id", "gt": [{bbox xywh, cls, iscrowd}], "det": ...}
        self._images: List[Dict] = []

    def digest(self, gt: Any, pred: Any) -> None:
        """gt: dataset sample (with 'annotations'); pred: wrapper result dict
        with 'boxes' xyxy (original coords), 'scores', 'classes'."""
        anns = gt.get("annotations", [])
        gt_boxes, gt_cls, gt_crowd = [], [], []
        for a in anns:
            gt_boxes.append(a["bbox"])  # coco xywh
            cid = a["category_id"]
            gt_cls.append(self.cat_map[cid] if self.cat_map else cid)
            gt_crowd.append(a.get("iscrowd", 0))
        boxes_xyxy = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        det_boxes = boxes_xyxy.copy()
        det_boxes[:, 2:] -= det_boxes[:, :2]  # -> xywh
        record = {
            "image_id": gt.get("image_id", len(self._images)),
            "gt_boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "gt_cls": np.asarray(gt_cls, np.int64),
            "gt_crowd": np.asarray(gt_crowd, np.int64),
            "det_boxes": det_boxes,
            "det_cls": np.asarray(pred["classes"], np.int64).reshape(-1),
            "det_scores": np.asarray(pred["scores"], np.float64).reshape(-1),
        }
        if self.task == "segmentation":
            from ..ops.masks import decode_segmentation, paste_mask, rle_encode

            size = gt.get("org_input_size", {})
            h = size.get("height") or int(max(boxes_xyxy[:, 3], default=1))
            w = size.get("width") or int(max(boxes_xyxy[:, 2], default=1))
            record["hw"] = (h, w)
            record["gt_rles"] = [
                rle_encode(decode_segmentation(a["segmentation"], h, w))
                for a in anns
                if "segmentation" in a
            ]
            det_masks = pred.get("masks_28")
            if det_masks is not None:
                record["det_rles"] = [
                    rle_encode(paste_mask(m, b, h, w))
                    for m, b in zip(det_masks, boxes_xyxy)
                ]
            else:
                record["det_rles"] = []
        self._images.append(record)

    # ------------------------------------------------------------------ AP
    def _evaluate_class(self, cls: int) -> Optional[np.ndarray]:
        """Returns AP per IoU threshold for one class, or None if no gt."""
        scores_all, matched_all, n_gt = [], [], 0
        for img in self._images:
            g_sel = img["gt_cls"] == cls
            d_sel = img["det_cls"] == cls
            g = img["gt_boxes"][g_sel]
            crowd = img["gt_crowd"][g_sel]
            d = img["det_boxes"][d_sel]
            s = img["det_scores"][d_sel]
            order = np.argsort(-s)[:MAX_DETS]
            d, s = d[order], s[order]
            n_gt += int((crowd == 0).sum())
            if self.task == "segmentation" and "gt_rles" in img:
                iou = self._mask_iou_matrix(img, d_sel, g_sel, order, crowd)
            else:
                iou = _iou_xywh(d, g, crowd)
            # greedy match per IoU threshold
            matched = np.zeros((len(IOU_THRS), len(d)), np.int8)  # 1 tp, -1 ignore
            for ti, t in enumerate(IOU_THRS):
                taken = np.zeros(len(g), bool)
                for di in range(len(d)):
                    best, best_iou = -1, t
                    for gi in range(len(g)):
                        if taken[gi] and not crowd[gi]:
                            continue
                        if iou[di, gi] >= best_iou or (
                            crowd[gi] and iou[di, gi] >= t and best == -1
                        ):
                            if iou[di, gi] >= best_iou:
                                best, best_iou = gi, iou[di, gi]
                    if best >= 0:
                        if crowd[best]:
                            matched[ti, di] = -1
                        else:
                            matched[ti, di] = 1
                            taken[best] = True
            scores_all.append(s)
            matched_all.append(matched)

        if n_gt == 0:
            return None
        if not scores_all:
            return np.zeros(len(IOU_THRS))
        scores = np.concatenate(scores_all)
        matched = np.concatenate(matched_all, axis=1)
        order = np.argsort(-scores, kind="mergesort")
        matched = matched[:, order]

        aps = np.zeros(len(IOU_THRS))
        for ti in range(len(IOU_THRS)):
            m = matched[ti]
            keep = m >= 0  # drop crowd-ignored dets
            tp = np.cumsum(m[keep] == 1)
            fp = np.cumsum(m[keep] == 0)
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # monotone precision envelope
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            # 101-point interpolation
            if len(precision) == 0:
                aps[ti] = 0.0
                continue
            idx = np.searchsorted(recall, RECALL_THRS, side="left")
            prec_at = np.where(
                idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0
            )
            aps[ti] = prec_at.mean()
        return aps

    def _mask_iou_matrix(self, img, d_sel, g_sel, order, crowd):
        from ..ops.masks import rle_decode

        det_idx = np.nonzero(d_sel)[0][order]
        gt_idx = np.nonzero(g_sel)[0]
        dm = [rle_decode(img["det_rles"][i]) for i in det_idx]
        gm = [rle_decode(img["gt_rles"][i]) for i in gt_idx]
        iou = np.zeros((len(dm), len(gm)))
        for di, d in enumerate(dm):
            da = d.sum()
            for gi, g in enumerate(gm):
                inter = np.logical_and(d, g).sum()
                denom = da if crowd[gi] else da + g.sum() - inter
                iou[di, gi] = inter / denom if denom else 0.0
        return iou

    def results(self, save_path: Optional[str] = None) -> Dict:
        classes = set()
        for img in self._images:
            classes.update(img["gt_cls"].tolist())
            classes.update(img["det_cls"].tolist())
        per_class = {}
        for cls in sorted(classes):
            aps = self._evaluate_class(int(cls))
            if aps is not None:
                per_class[int(cls)] = aps
        if per_class:
            all_aps = np.stack(list(per_class.values()))
            ap = float(all_aps.mean())
            ap50 = float(all_aps[:, 0].mean())
        else:
            ap = ap50 = float("nan")
        out = {
            "AP": ap * 100,
            "AP50": ap50 * 100,
            "mAP@0.5IOU": ap50 * 100,
            "per_class_AP50": {k: float(v[0]) * 100 for k, v in per_class.items()},
        }
        self._dump(out, save_path)
        return out


    # ------------------------------------------------- cross-sequence merge
    def save_state(self, path) -> None:
        """Persist accumulated per-image records for offline re-aggregation
        (ref MOT prediction stash, evaluators.py:498-505; consumed by the
        overall-mAP tool like utils/compute_overall_map.py:89-183)."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self._images, f)

    def load_state(self, path) -> None:
        import pickle

        with open(path, "rb") as f:
            self._images.extend(pickle.load(f))

    def merge(self, other: "COCOEval") -> None:
        self._images.extend(other._images)
