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
    """CLEAR-MOT with the reference's protocol details:

    - ignore-region filtering (ref evaluators.py:460-477): hypotheses
      Hungarian-matched (IoU >= 0.5) to the frame's `gt_ignore` boxes are
      dropped before accumulation;
    - skip_first_frame: the reference's JDE evaluator accumulates
      `dataset[1:]` only (ref evaluators.py:448);
    - results() reports the motchallenge metric set the reference digests
      (evaluators.py:503-540): mota/motp/idf1/idp/idr/recall/precision/
      MT/PT/ML/fragmentations, computed dependency-free from the stash.
    """

    def __init__(self, datacatalog=None, dataset=None, criteria: str = "mota",
                 iou_threshold: float = 0.5, skip_first_frame: bool = False,
                 filter_ignore_regions: bool = True, **kwargs):
        self.iou_threshold = iou_threshold
        self.skip_first_frame = skip_first_frame
        self.filter_ignore_regions = filter_ignore_regions
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
        self._frame_idx = 0
        # trajectory bookkeeping for IDF1 / MT / ML / fragmentations
        self._gt_frames: Dict[int, int] = {}          # gt id -> frames seen
        self._gt_matched_frames: Dict[int, int] = {}  # gt id -> frames matched
        self._gt_last_state: Dict[int, bool] = {}     # gt id -> matched last seen
        self._frag: Dict[int, int] = {}               # gt id -> fragmentations
        self._pair_frames: Dict[tuple, int] = {}      # (gt id, hyp id) -> co-match potential
        self._hyp_frames: Dict[int, int] = {}         # hyp id -> frames seen

    def _filter_ignored(self, gt: Dict, hyp_boxes, hyp_ids, extra=()):
        """Drop hypotheses matched to ignore regions (ref :460-477)."""
        ign = gt.get("gt_ignore", []) if isinstance(gt, dict) else []
        if not (self.filter_ignore_regions and len(ign) and len(hyp_boxes)):
            return (hyp_boxes, hyp_ids) + tuple(extra)
        ign_boxes = np.asarray([r["tlwh"] for r in ign], np.float64).reshape(-1, 4)
        iou = _iou_tlwh(ign_boxes, hyp_boxes)
        cost = np.where(iou >= self.iou_threshold, 1.0 - iou, np.inf)
        keep = np.ones(len(hyp_boxes), bool)
        rows, cols = _safe_assignment(cost)
        for r, c in zip(rows, cols):
            if np.isfinite(cost[r, c]):
                keep[c] = False
        return (hyp_boxes[keep], hyp_ids[keep]) + tuple(e[keep] for e in extra)

    def digest(self, gt: Any, pred: Any) -> None:
        """gt: sample with 'gt' = [{id, tlwh}] (+ optional 'gt_ignore');
        pred: list of {'track_id', 'tlwh'} (host tracker output)."""
        gt_recs = gt.get("gt", []) if isinstance(gt, dict) else gt
        gt_ids = np.asarray([r["id"] for r in gt_recs], np.int64)
        gt_boxes = np.asarray([r["tlwh"] for r in gt_recs], np.float64).reshape(-1, 4)
        hyp_ids = np.asarray([p["track_id"] for p in pred], np.int64)
        hyp_boxes = np.asarray([p["tlwh"] for p in pred], np.float64).reshape(-1, 4)
        self.stashed.append(
            {"gt_ids": gt_ids, "gt_boxes": gt_boxes, "hyp_ids": hyp_ids, "hyp_boxes": hyp_boxes}
        )
        self._frame_idx += 1
        if self.skip_first_frame and self._frame_idx == 1:
            return

        hyp_boxes, hyp_ids = self._filter_ignored(gt, hyp_boxes, hyp_ids)
        self._accumulate(gt_ids, gt_boxes, hyp_ids, hyp_boxes)

    def _accumulate(self, gt_ids, gt_boxes, hyp_ids, hyp_boxes) -> None:
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

        # trajectory bookkeeping for ID metrics / MT / ML / fragmentations
        for hid in hyp_ids:
            self._hyp_frames[int(hid)] = self._hyp_frames.get(int(hid), 0) + 1
        # ID-metric potentials: every (gt, hyp) pair that COULD match this
        # frame (IoU >= thr), independent of the CLEAR assignment
        for gi, hi in zip(*np.nonzero(iou >= self.iou_threshold)):
            pair = (int(gt_ids[gi]), int(hyp_ids[hi]))
            self._pair_frames[pair] = self._pair_frames.get(pair, 0) + 1
        for gi, gid in enumerate(gt_ids):
            gid = int(gid)
            matched = gid in matches
            self._gt_frames[gid] = self._gt_frames.get(gid, 0) + 1
            if matched:
                self._gt_matched_frames[gid] = self._gt_matched_frames.get(gid, 0) + 1
                if self._gt_last_state.get(gid) is False:
                    self._frag[gid] = self._frag.get(gid, 0) + 1
            self._gt_last_state[gid] = matched

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

    def _id_metrics(self) -> Dict:
        """IDF1/IDP/IDR: max-weight bipartite matching of gt vs hyp
        trajectories over per-frame overlap potentials (MOT16 ID metrics)."""
        gt_tot = sum(self._gt_frames.values())
        hyp_tot = sum(self._hyp_frames.values())
        if not self._pair_frames or not gt_tot or not hyp_tot:
            return {"idf1": float("nan"), "idp": float("nan"), "idr": float("nan")}
        g_ids = sorted(self._gt_frames)
        h_ids = sorted(self._hyp_frames)
        gi = {g: i for i, g in enumerate(g_ids)}
        hi = {h: i for i, h in enumerate(h_ids)}
        w = np.zeros((len(g_ids), len(h_ids)))
        for (g, h), n in self._pair_frames.items():
            if g in gi and h in hi:
                w[gi[g], hi[h]] = n
        rows, cols = linear_sum_assignment(-w)
        idtp = float(w[rows, cols].sum())
        idfp = hyp_tot - idtp
        idfn = gt_tot - idtp
        return {
            "idf1": 100 * 2 * idtp / (2 * idtp + idfp + idfn),
            "idp": 100 * idtp / max(idtp + idfp, 1e-9),
            "idr": 100 * idtp / max(idtp + idfn, 1e-9),
        }

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
        # trajectory coverage: MT >= 80% tracked, ML < 20% (CLEAR definitions)
        mt = pt = ml = 0
        for gid, n in self._gt_frames.items():
            cov = self._gt_matched_frames.get(gid, 0) / n
            if cov >= 0.8:
                mt += 1
            elif cov < 0.2:
                ml += 1
            else:
                pt += 1
        out = {
            "mota": mota * 100,
            "motp": motp,
            "recall": 100 * self.num_matches / self.num_gt if self.num_gt else float("nan"),
            "precision": (
                100 * self.num_matches / (self.num_matches + self.num_fp)
                if (self.num_matches + self.num_fp)
                else float("nan")
            ),
            "num_unique_objects": len(self._gt_frames),
            "mostly_tracked": mt,
            "partially_tracked": pt,
            "mostly_lost": ml,
            "num_false_positives": self.num_fp,
            "num_misses": self.num_miss,
            "num_switches": self.num_switches,
            "num_fragmentations": int(sum(self._frag.values())),
            # short aliases kept for earlier consumers
            "num_gt": self.num_gt,
            "fp": self.num_fp,
            "fn": self.num_miss,
            "idsw": self.num_switches,
            **self._id_metrics(),
        }
        self._dump(out, save_path)
        return out


def _safe_assignment(cost: np.ndarray):
    """linear_sum_assignment tolerating inf-only rows/cols."""
    finite = np.where(np.isfinite(cost), cost, 1e9)
    return linear_sum_assignment(finite)


@register_evaluator("MOT-JDE-EVAL")
class MOTJDEEval(MOTEval):
    """Reference MOT_JDE_Eval protocol (evaluators.py:324-505): skip the
    very first frame, drop ignore-matched hypotheses, full metric set."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("skip_first_frame", True)
        super().__init__(*args, **kwargs)


@register_evaluator("MOT-HIEVE-EVAL")
class MOTHiEveEval(MOTJDEEval):
    """Reference MOT_HiEve_Eval (evaluators.py:551-593): same protocol,
    munkres-solved in the reference — solver choice does not change CLEAR
    results for finite costs."""


@register_evaluator("MOT-TVD-EVAL")
class MOTTVDEval(MOTEval):
    """Reference MOT_TVD_Eval / motmetrics CLEAR_MOT_M (evaluators.py:508-548):
    before accumulation, hypotheses Hungarian-matched to DISTRACTOR-class gt
    (person_on_vehicle/static_person/distractor/reflection) are removed, and
    only class-1 (pedestrian) gt rows are scored. gt records must carry
    'class_id' (datasets.catalogs.read_mot_gt provides it); seqinfo frame
    accounting is handled by the dataset/catalog layer."""

    DISTRACTORS = frozenset({2, 7, 8, 12})

    def digest(self, gt: Any, pred: Any) -> None:
        gt_recs = gt.get("gt", []) if isinstance(gt, dict) else gt
        hyp_ids = np.asarray([p["track_id"] for p in pred], np.int64)
        hyp_boxes = np.asarray([p["tlwh"] for p in pred], np.float64).reshape(-1, 4)
        all_ids = np.asarray([r["id"] for r in gt_recs], np.int64)
        all_boxes = np.asarray([r["tlwh"] for r in gt_recs], np.float64).reshape(-1, 4)
        classes = np.asarray([r.get("class_id", 1) for r in gt_recs], np.int64)
        self.stashed.append(
            {"gt_ids": all_ids, "gt_boxes": all_boxes, "hyp_ids": hyp_ids, "hyp_boxes": hyp_boxes}
        )
        self._frame_idx += 1
        if self.skip_first_frame and self._frame_idx == 1:
            return

        # CLEAR_MOT_M step 1: remove hyps matched to distractor gt
        if len(all_boxes) and len(hyp_boxes):
            iou = _iou_tlwh(all_boxes, hyp_boxes)
            cost = np.where(iou >= self.iou_threshold, 1.0 - iou, np.inf)
            rows, cols = _safe_assignment(cost)
            drop = np.zeros(len(hyp_boxes), bool)
            for r, c in zip(rows, cols):
                if np.isfinite(cost[r, c]) and int(classes[r]) in self.DISTRACTORS:
                    drop[c] = True
            hyp_boxes, hyp_ids = hyp_boxes[~drop], hyp_ids[~drop]

        hyp_boxes, hyp_ids = self._filter_ignored(gt, hyp_boxes, hyp_ids)

        # CLEAR_MOT_M step 2: score pedestrian-class gt only
        keep_gt = classes == 1
        self._accumulate(all_ids[keep_gt], all_boxes[keep_gt], hyp_ids, hyp_boxes)
