"""OIV6 instance-segmentation protocol for the OID Challenge evaluator
(VERDICT r1 item 4; ref evaluators.py:235-286 + np_box_mask_list_ops):
mask-IoU matching, group-of masks via intersection-over-detection-area."""

import numpy as np

from lmsfc_tpu.evaluators.oid_challenge import OpenImagesChallengeEval
from lmsfc_tpu.ops.masks import rle_encode


def _rect_mask(h, w, y1, x1, y2, x2):
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


H, W = 120, 160


def _gt(anns, verified=None):
    return {
        "annotations": anns,
        "org_input_size": {"height": H, "width": W},
        "verified_labels": verified,
    }


def _ann(y1, x1, y2, x2, cat=1, group=0, as_rle=False):
    mask = _rect_mask(H, W, y1, x1, y2, x2)
    seg = rle_encode(mask) if as_rle else mask
    return {
        "bbox": [x1, y1, x2 - x1, y2 - y1],
        "category_id": cat,
        "isgroupof": group,
        "segmentation": seg,
    }


def _pred(masks, boxes, scores, classes):
    return {
        "boxes": np.asarray(boxes, np.float64),
        "scores": np.asarray(scores, np.float64),
        "classes": np.asarray(classes, np.int64),
        "masks": masks,
    }


class TestOIDSegmentation:
    def test_perfect_masks(self):
        ev = OpenImagesChallengeEval(task="segmentation")
        ev.digest(
            _gt([_ann(10, 10, 50, 50), _ann(60, 80, 100, 120, as_rle=True)]),
            _pred(
                [_rect_mask(H, W, 10, 10, 50, 50), _rect_mask(H, W, 60, 80, 100, 120)],
                [[10, 10, 50, 50], [80, 60, 120, 100]],
                [0.9, 0.8],
                [1, 1],
            ),
        )
        assert ev.results()["mAP@0.5IOU"] == 100.0

    def test_mask_disagrees_with_box(self):
        """Box IoU high but MASK IoU low: segmentation mode must miss."""
        ev = OpenImagesChallengeEval(task="segmentation")
        # gt mask fills the box; det mask covers only a thin stripe (20%)
        ev.digest(
            _gt([_ann(10, 10, 60, 60)]),
            _pred(
                [_rect_mask(H, W, 10, 10, 20, 60)],  # 10/50 rows
                [[10, 10, 60, 60]],                   # same box as gt
                [0.9],
                [1],
            ),
        )
        res = ev.results()
        assert res["mAP@0.5IOU"] == 0.0
        # detection mode on the same data would have scored it
        ev2 = OpenImagesChallengeEval(task="detection")
        ev2.digest(
            _gt([_ann(10, 10, 60, 60)]),
            {"boxes": [[10, 10, 60, 60]], "scores": [0.9], "classes": [1]},
        )
        assert ev2.results()["mAP@0.5IOU"] == 100.0

    def test_group_of_mask_ioa(self):
        """Group-of mask: a det fully inside the group mask (IOA 1.0) is a
        single TP; a second det inside the same group is ignored."""
        ev = OpenImagesChallengeEval(task="segmentation")
        ev.digest(
            _gt([_ann(10, 10, 110, 150, group=1)]),
            _pred(
                [
                    _rect_mask(H, W, 20, 20, 40, 40),
                    _rect_mask(H, W, 60, 60, 80, 80),
                ],
                [[20, 20, 40, 40], [60, 60, 80, 80]],
                [0.9, 0.8],
                [1, 1],
            ),
        )
        res = ev.results()
        # one group = one gt; first det TP, second ignored -> AP 100
        assert res["mAP@0.5IOU"] == 100.0

    def test_28x28_head_masks_are_pasted(self):
        """Mask-head 28x28 prob maps paste into full-image masks via the
        detection box (D2 postprocess path)."""
        ev = OpenImagesChallengeEval(task="segmentation")
        ev.digest(
            _gt([_ann(10, 10, 66, 66)]),
            _pred(
                [np.ones((28, 28), np.float32)],  # full-box mask
                [[10, 10, 66, 66]],
                [0.9],
                [1],
            ),
        )
        assert ev.results()["mAP@0.5IOU"] == 100.0
