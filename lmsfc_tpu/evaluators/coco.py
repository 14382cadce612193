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
# pycocotools area ranges (cocoeval.py setDetParams)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


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
        gt_boxes, gt_cls, gt_crowd, gt_area = [], [], [], []
        for a in anns:
            gt_boxes.append(a["bbox"])  # coco xywh
            cid = a["category_id"]
            gt_cls.append(self.cat_map[cid] if self.cat_map else cid)
            gt_crowd.append(a.get("iscrowd", 0))
            # pycocotools ranges filter on the ANNOTATION area field
            gt_area.append(a.get("area", a["bbox"][2] * a["bbox"][3]))
        boxes_xyxy = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
        det_boxes = boxes_xyxy.copy()
        det_boxes[:, 2:] -= det_boxes[:, :2]  # -> xywh
        record = {
            "image_id": gt.get("image_id", len(self._images)),
            "gt_boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "gt_cls": np.asarray(gt_cls, np.int64),
            "gt_crowd": np.asarray(gt_crowd, np.int64),
            "gt_area": np.asarray(gt_area, np.float64),
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
    def _evaluate_class(self, cls: int, area_rng=AREA_RNG["all"], max_dets=MAX_DETS):
        """(AP per IoU thr, max recall per IoU thr) for one class, or None
        if the class has no in-range gt.

        Faithful transcription of pycocotools cocoeval.evaluateImg /
        accumulate: gt ignored when crowd OR area outside area_rng; a det
        prefers unignored gt, may fall back to an ignored/crowd match (then
        itself ignored); unmatched dets with out-of-range area are ignored
        rather than counted FP (VERDICT r1 item 4 — area-range AP/AR).
        """
        scores_all, matched_all, n_gt = [], [], 0
        lo, hi = area_rng
        for img in self._images:
            g_sel = img["gt_cls"] == cls
            d_sel = img["det_cls"] == cls
            g = img["gt_boxes"][g_sel]
            crowd = img["gt_crowd"][g_sel].astype(bool)
            g_area = img["gt_area"][g_sel]
            g_ignore = crowd | (g_area < lo) | (g_area > hi)
            d = img["det_boxes"][d_sel]
            s = img["det_scores"][d_sel]
            order = np.argsort(-s, kind="mergesort")[:max_dets]
            d, s = d[order], s[order]
            d_area = d[:, 2] * d[:, 3]
            n_gt += int((~g_ignore).sum())
            if self.task == "segmentation" and "gt_rles" in img:
                iou = self._mask_iou_matrix(img, d_sel, g_sel, order, crowd)
            else:
                iou = _iou_xywh(d, g, crowd)
            # gt sorted unignored-first (pycocotools gtind sort)
            gt_order = np.argsort(g_ignore, kind="mergesort")
            iou = iou[:, gt_order]
            g_ignore_s = g_ignore[gt_order]
            crowd_s = crowd[gt_order]

            matched = np.zeros((len(IOU_THRS), len(d)), np.int8)  # 1 tp, -1 ignore
            for ti, t in enumerate(IOU_THRS):
                taken = np.zeros(len(g), bool)
                for di in range(len(d)):
                    best = -1
                    best_iou = min(t, 1.0 - 1e-10)
                    for gi in range(len(g)):
                        if taken[gi] and not crowd_s[gi]:
                            continue
                        # unignored match already found; remaining gt are
                        # all ignored (sorted) -> stop
                        if best > -1 and not g_ignore_s[best] and g_ignore_s[gi]:
                            break
                        if iou[di, gi] < best_iou:
                            continue
                        best, best_iou = gi, iou[di, gi]
                    if best == -1:
                        # unmatched det outside the area range: ignored
                        if d_area[di] < lo or d_area[di] > hi:
                            matched[ti, di] = -1
                        continue
                    if g_ignore_s[best]:
                        matched[ti, di] = -1
                    else:
                        matched[ti, di] = 1
                        taken[best] = True
            scores_all.append(s)
            matched_all.append(matched)

        if n_gt == 0:
            return None
        if not scores_all:
            return np.zeros(len(IOU_THRS)), np.zeros(len(IOU_THRS))
        scores = np.concatenate(scores_all)
        matched = np.concatenate(matched_all, axis=1)
        order = np.argsort(-scores, kind="mergesort")
        matched = matched[:, order]

        aps = np.zeros(len(IOU_THRS))
        recalls = np.zeros(len(IOU_THRS))
        for ti in range(len(IOU_THRS)):
            m = matched[ti]
            keep = m >= 0  # drop ignored dets
            tp = np.cumsum(m[keep] == 1)
            fp = np.cumsum(m[keep] == 0)
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            recalls[ti] = recall[-1] if len(recall) else 0.0
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
        return aps, recalls

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
        classes = sorted(classes)

        def _mean_ap(area, max_dets=MAX_DETS, iou_idx=None):
            vals = []
            for cls in classes:
                r = self._evaluate_class(int(cls), AREA_RNG[area], max_dets)
                if r is not None:
                    aps = r[0]
                    vals.append(aps if iou_idx is None else aps[iou_idx])
            return float(np.mean(vals)) if vals else float("nan")

        def _mean_ar(area, max_dets):
            vals = []
            for cls in classes:
                r = self._evaluate_class(int(cls), AREA_RNG[area], max_dets)
                if r is not None:
                    vals.append(r[1].mean())
            return float(np.mean(vals)) if vals else float("nan")

        per_class = {}
        for cls in classes:
            r = self._evaluate_class(int(cls))
            if r is not None:
                per_class[int(cls)] = r[0]
        if per_class:
            all_aps = np.stack(list(per_class.values()))
            ap = float(all_aps.mean())
            ap50 = float(all_aps[:, 0].mean())
            ap75 = float(all_aps[:, 5].mean())
        else:
            ap = ap50 = ap75 = float("nan")
        out = {
            # the full COCO metric set (pycocotools summarize() order)
            "AP": ap * 100,
            "AP50": ap50 * 100,
            "AP75": ap75 * 100,
            "APs": _mean_ap("small") * 100,
            "APm": _mean_ap("medium") * 100,
            "APl": _mean_ap("large") * 100,
            "AR@1": _mean_ar("all", 1) * 100,
            "AR@10": _mean_ar("all", 10) * 100,
            "AR@100": _mean_ar("all", MAX_DETS) * 100,
            "ARs": _mean_ar("small", MAX_DETS) * 100,
            "ARm": _mean_ar("medium", MAX_DETS) * 100,
            "ARl": _mean_ar("large", MAX_DETS) * 100,
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
