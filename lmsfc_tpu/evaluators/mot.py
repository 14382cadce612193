"""CLEAR-MOT evaluator (MOTA/IDSW/FP/FN) — scipy Hungarian, dependency-free.

Stands in for the motmetrics-based MOT_JDE/TVD/HiEve evaluators
(compressai_vision/evaluators/evaluators.py:324-593): per-frame gt/hyp
association by IoU (>=0.5) with match continuity (CLEAR), identity-switch
counting, MOTA/MOTP aggregation. Predictions are also stashed for offline
cross-sequence re-accumulation (ref evaluators.py:498-505 /
utils/compute_overall_mot.py:57-120).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment

from ..registry import register_evaluator
from .base_evaluator import BaseEvaluator


def _iou_tlwh(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    ax1, ay1 = a[:, 0], a[:, 1]
    ax2, ay2 = a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]
    bx1, by1 = b[:, 0], b[:, 1]
    bx2, by2 = b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]
    ix = np.maximum(0, np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None]))
    iy = np.maximum(0, np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None]))
    inter = ix * iy
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None] - inter
    return np.where(union > 0, inter / union, 0.0)


@register_evaluator("MOT-EVAL")
class MOTEval(BaseEvaluator):
    def __init__(self, datacatalog=None, dataset=None, criteria: str = "mota",
                 iou_threshold: float = 0.5, **kwargs):
        self.iou_threshold = iou_threshold
        super().__init__(datacatalog, dataset, criteria, **kwargs)

    def reset(self) -> None:
        self._last_match: Dict[int, int] = {}  # gt id -> hyp id
        self.num_gt = 0
        self.num_fp = 0
        self.num_miss = 0
        self.num_switches = 0
        self.num_matches = 0
        self.sum_iou = 0.0
        self.stashed: List[Dict] = []

    def digest(self, gt: Any, pred: Any) -> None:
        """gt: sample with 'gt' = [{id, tlwh}]; pred: list of
        {'track_id', 'tlwh'} (host tracker output)."""
        gt_recs = gt.get("gt", []) if isinstance(gt, dict) else gt
        gt_ids = np.asarray([r["id"] for r in gt_recs], np.int64)
        gt_boxes = np.asarray([r["tlwh"] for r in gt_recs], np.float64).reshape(-1, 4)
        hyp_ids = np.asarray([p["track_id"] for p in pred], np.int64)
        hyp_boxes = np.asarray([p["tlwh"] for p in pred], np.float64).reshape(-1, 4)
        self.stashed.append(
            {"gt_ids": gt_ids, "gt_boxes": gt_boxes, "hyp_ids": hyp_ids, "hyp_boxes": hyp_boxes}
        )

        self.num_gt += len(gt_ids)
        iou = _iou_tlwh(gt_boxes, hyp_boxes)
        matches: Dict[int, int] = {}

        # CLEAR step 1: keep persisting matches still above threshold
        used_g, used_h = set(), set()
        for gi, gid in enumerate(gt_ids):
            prev_h = self._last_match.get(int(gid))
            if prev_h is None:
                continue
            hi_arr = np.nonzero(hyp_ids == prev_h)[0]
            if len(hi_arr) and iou[gi, hi_arr[0]] >= self.iou_threshold:
                hi = int(hi_arr[0])
                matches[int(gid)] = int(prev_h)
                used_g.add(gi)
                used_h.add(hi)
                self.sum_iou += iou[gi, hi]

        # CLEAR step 2: Hungarian on the rest (maximize IoU)
        free_g = [i for i in range(len(gt_ids)) if i not in used_g]
        free_h = [i for i in range(len(hyp_ids)) if i not in used_h]
        if free_g and free_h:
            sub = iou[np.ix_(free_g, free_h)]
            cost = 1.0 - sub
            rows, cols = linear_sum_assignment(cost)
            for r, c in zip(rows, cols):
                if sub[r, c] >= self.iou_threshold:
                    gi, hi = free_g[r], free_h[c]
                    gid, hid = int(gt_ids[gi]), int(hyp_ids[hi])
                    if gid in self._last_match and self._last_match[gid] != hid:
                        self.num_switches += 1
                    matches[gid] = hid
                    used_g.add(gi)
                    used_h.add(hi)
                    self.sum_iou += sub[r, c]

        self.num_matches += len(matches)
        self.num_miss += len(gt_ids) - len([g for g in range(len(gt_ids)) if g in used_g])
        self.num_fp += len(hyp_ids) - len(used_h)
        self._last_match.update(matches)

    def save_predictions_mot(self, path) -> None:
        """Write stashed hypotheses as a MOT-format txt
        (frame,id,x,y,w,h,1,-1,-1,-1) for offline re-aggregation (the
        reference stashes .h5 predictions, evaluators.py:498-505)."""
        from pathlib import Path

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            for frame_idx, rec in enumerate(self.stashed, start=1):
                for hid, box in zip(rec["hyp_ids"], rec["hyp_boxes"]):
                    x, y, w, h = box
                    f.write(f"{frame_idx},{hid},{x:.2f},{y:.2f},{w:.2f},{h:.2f},1,-1,-1,-1\n")

    def results(self, save_path: Optional[str] = None) -> Dict:
        if save_path is not None:
            self.save_predictions_mot(
                f"{save_path}/{self.__class__.__name__}_predictions.txt"
            )
        mota = (
            1.0 - (self.num_fp + self.num_miss + self.num_switches) / self.num_gt
            if self.num_gt
            else float("nan")
        )
        motp = self.sum_iou / self.num_matches if self.num_matches else float("nan")
        out = {
            "mota": mota * 100,
            "motp": motp,
            "num_gt": self.num_gt,
            "fp": self.num_fp,
            "fn": self.num_miss,
            "idsw": self.num_switches,
        }
        self._dump(out, save_path)
        return out
