import numpy as np
import pytest

from lmsfc_tpu.ops.masks import (
    decode_segmentation,
    mask_iou,
    paste_mask,
    polygons_to_mask,
    rle_decode,
    rle_encode,
)


class TestRLE:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            m = (rng.random((23, 31)) > 0.6).astype(np.uint8)
            assert np.array_equal(rle_decode(rle_encode(m)), m)

    def test_roundtrip_structured(self):
        m = np.zeros((64, 64), np.uint8)
        m[10:40, 20:50] = 1
        assert np.array_equal(rle_decode(rle_encode(m)), m)

    def test_empty_and_full(self):
        for m in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
            assert np.array_equal(rle_decode(rle_encode(m)), m)

    def test_uncompressed_counts(self):
        # column-major: 3 zeros then 2 ones then rest zeros
        m = rle_decode({"size": [5, 2], "counts": [3, 2, 5]})
        expect = np.zeros((5, 2), np.uint8)
        expect[3:5, 0] = 1
        assert np.array_equal(m, expect)


class TestPaste:
    def test_full_box(self):
        mask28 = np.ones((28, 28), np.float32)
        out = paste_mask(mask28, [4, 6, 12, 16], 20, 20)
        assert out[6:16, 4:12].all()
        assert out.sum() == 10 * 8

    def test_polygon_rasterize(self):
        poly = [[2, 2, 10, 2, 10, 10, 2, 10]]
        m = polygons_to_mask(poly, 16, 16)
        assert m[5, 5] == 1 and m[0, 0] == 0

    def test_mask_iou(self):
        a = np.zeros((10, 10), np.uint8)
        b = np.zeros((10, 10), np.uint8)
        a[:5] = 1
        b[2:7] = 1
        assert mask_iou(a, b) == pytest.approx(30 / 70)


class TestSegmEval:
    def test_perfect_segmentation_ap(self):
        from lmsfc_tpu.evaluators.coco import COCOEval

        ev = COCOEval(task="segmentation")
        # gt: square mask 10..30; det box matches, mask28 full
        gt = {
            "image_id": 0,
            "org_input_size": {"height": 64, "width": 64},
            "annotations": [
                {
                    "bbox": [10, 10, 20, 20],
                    "category_id": 0,
                    "iscrowd": 0,
                    "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]],
                }
            ],
        }
        pred = {
            "boxes": np.array([[10.0, 10.0, 30.0, 30.0]]),
            "scores": np.array([0.9]),
            "classes": np.array([0]),
            "masks_28": np.ones((1, 28, 28), np.float32),
        }
        ev.digest(gt, pred)
        res = ev.results()
        assert res["AP50"] == pytest.approx(100.0)
