"""COCO evaluator protocol tests with hand-computed golden values
(VERDICT r1 item 4: area-range AP/AR + pycocotools-faithful matching;
pycocotools is not installable here, so the expectations below are derived
by hand from the cocoeval algorithm and double-checked analytically)."""

import numpy as np

from lmsfc_tpu.evaluators.coco import COCOEval


def _gt(image_id, anns):
    return {"image_id": image_id, "annotations": anns}


def _ann(bbox, cat=1, crowd=0, area=None):
    return {
        "bbox": list(bbox),
        "category_id": cat,
        "iscrowd": crowd,
        "area": area if area is not None else bbox[2] * bbox[3],
    }


def _pred(boxes_xyxy, scores, classes):
    return {
        "boxes": np.asarray(boxes_xyxy, np.float64),
        "scores": np.asarray(scores, np.float64),
        "classes": np.asarray(classes, np.int64),
    }


class TestBasics:
    def test_perfect_detection(self):
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 40, 80]), _ann([200, 50, 40, 80])]),
            _pred([[10, 10, 50, 90], [200, 50, 240, 130]], [0.9, 0.8], [1, 1]),
        )
        res = ev.results()
        assert res["AP"] == 100.0 and res["AP75"] == 100.0
        assert res["AR@100"] == 100.0

    def test_single_fp_precision(self):
        """1 gt, TP at score .9 plus FP at score .8:
        P-R points: (r=1, p=1) then (r=1, p=.5); envelope keeps p=1 at r<=1
        -> AP50 = 100."""
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 40, 80])]),
            _pred([[10, 10, 50, 90], [400, 10, 440, 90]], [0.9, 0.8], [1, 1]),
        )
        assert ev.results()["AP50"] == 100.0

    def test_fp_above_tp_score(self):
        """FP scored ABOVE the TP: first point (r=0,p=0), then (r=1,p=.5);
        101-pt AP = .5 (envelope .5 across all recall)."""
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 40, 80])]),
            _pred([[400, 10, 440, 90], [10, 10, 50, 90]], [0.9, 0.8], [1, 1]),
        )
        assert ev.results()["AP50"] == 50.0


class TestCrowd:
    def test_crowd_match_ignored_not_fp(self):
        """Det overlapping only a crowd region: ignored, so the remaining
        TP still gives AP 100 (pycocotools crowd fallback)."""
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 40, 80]), _ann([100, 100, 300, 300], crowd=1)]),
            _pred(
                [[10, 10, 50, 90], [150, 150, 250, 250]], [0.9, 0.8], [1, 1]
            ),
        )
        res = ev.results()
        assert res["AP50"] == 100.0

    def test_crowd_not_counted_as_gt(self):
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 40, 80]), _ann([100, 100, 300, 300], crowd=1)]),
            _pred([[10, 10, 50, 90]], [0.9], [1]),
        )
        # recall denominator excludes the crowd: AR = 100
        assert ev.results()["AR@100"] == 100.0


class TestAreaRanges:
    def test_aps_only_scores_small_gt(self):
        """Small gt (16x16 = 256 < 32^2) detected; large gt (128x128)
        missed. APs sees only the small gt -> 100; APl sees only the large
        one -> 0; AP (all) averages both."""
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 16, 16]), _ann([200, 200, 128, 128])]),
            _pred([[10, 10, 26, 26]], [0.9], [1]),
        )
        res = ev.results()
        assert res["APs"] == 100.0
        assert res["APl"] == 0.0
        assert res["ARs"] == 100.0 and res["ARl"] == 0.0

    def test_out_of_range_det_ignored_not_fp(self):
        """In the small-area pass, an unmatched LARGE det must be ignored
        (dtIg rule), not counted FP against the small gt."""
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 16, 16])]),
            _pred(
                [[300, 300, 428, 428], [10, 10, 26, 26]], [0.95, 0.9], [1, 1]
            ),
        )
        res = ev.results()
        assert res["APs"] == 100.0  # large FP ignored in the small range

    def test_medium_range(self):
        ev = COCOEval()
        # 64x64 = 4096, between 32^2 and 96^2
        ev.digest(
            _gt(0, [_ann([10, 10, 64, 64])]),
            _pred([[10, 10, 74, 74]], [0.9], [1]),
        )
        res = ev.results()
        assert res["APm"] == 100.0
        assert np.isnan(res["APs"]) and np.isnan(res["APl"])


class TestAR:
    def test_ar_maxdets_1(self):
        """2 gt, both detected, but AR@1 only keeps the top det -> 50."""
        ev = COCOEval()
        ev.digest(
            _gt(0, [_ann([10, 10, 40, 80]), _ann([200, 50, 40, 80])]),
            _pred([[10, 10, 50, 90], [200, 50, 240, 130]], [0.9, 0.8], [1, 1]),
        )
        res = ev.results()
        assert res["AR@1"] == 50.0
        assert res["AR@10"] == 100.0

    def test_ar_partial_iou(self):
        """Det with IoU ~0.6 vs gt: recalled at thresholds .5/.55/.6 only
        -> AR@100 = 3/10 * 100 = 30."""
        ev = COCOEval()
        # gt 100 wide, det shifted 25: inter 75, union 125 -> IoU 0.6
        ev.digest(
            _gt(0, [_ann([0, 0, 100, 100])]),
            _pred([[25, 0, 125, 100]], [0.9], [1]),
        )
        res = ev.results()
        assert abs(res["AR@100"] - 30.0) < 1e-6
