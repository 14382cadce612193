import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN
from lmsfc_tpu.models.rcnn_heads import anchors_for_level
from lmsfc_tpu.ops.boxes import box_iou, decode_boxes, nms_fixed
from lmsfc_tpu.ops.roi_align import assign_levels, roi_align_pyramid


class TestBoxOps:
    def test_iou_known_values(self):
        a = jnp.array([[0, 0, 10, 10]], jnp.float32)
        b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(box_iou(a, b))[0]
        assert iou[0] == pytest.approx(1.0)
        assert iou[1] == pytest.approx(25 / 175)
        assert iou[2] == 0.0

    def test_decode_identity(self):
        anchors = jnp.array([[0, 0, 10, 10]], jnp.float32)
        deltas = jnp.zeros((1, 4))
        out = np.asarray(decode_boxes(deltas, anchors))
        assert np.allclose(out, [[0, 0, 10, 10]], atol=1e-5)

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], jnp.float32
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        keep, valid = nms_fixed(boxes, scores, 0.5, 3)
        keep, valid = np.asarray(keep), np.asarray(valid)
        assert keep[0] == 0 and valid[0]
        assert keep[1] == 2 and valid[1]
        assert not valid[2]

    def test_anchor_geometry(self):
        a = anchors_for_level(2, 3, 4, 32)
        assert a.shape == (2 * 3 * 3, 4)
        # first anchor centered at (0,0), ratio 0.5 -> w = sqrt(2)*32
        w = a[0, 2] - a[0, 0]
        h = a[0, 3] - a[0, 1]
        assert w / h == pytest.approx(2.0, rel=1e-5)
        assert w * h == pytest.approx(32 * 32, rel=1e-5)


class TestRoiAlign:
    def test_constant_field(self):
        """Sampling a constant feature map returns the constant."""
        feats = [jnp.full((1, 32 // (2**i), 32 // (2**i), 4), 3.5) for i in range(4)]
        boxes = jnp.array([[4.0, 4.0, 60.0, 60.0]], jnp.float32)
        levels = assign_levels(boxes)
        out = roi_align_pyramid(feats, boxes, levels, output_size=7)
        assert out.shape == (1, 7, 7, 4)
        assert np.allclose(np.asarray(out), 3.5, atol=1e-5)

    def test_level_assignment(self):
        boxes = jnp.array(
            [
                [0, 0, 32, 32],      # tiny -> p2
                [0, 0, 224, 224],    # canonical -> p4
                [0, 0, 1000, 1000],  # huge -> p5
            ],
            jnp.float32,
        )
        lv = np.asarray(assign_levels(boxes))
        assert lv[0] == 2 and lv[1] == 4 and lv[2] == 5

    def test_linear_gradient_sampling(self):
        """Bilinear sampling of a linear ramp is exact."""
        h = w = 16
        ramp = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)
        )[None, :, :, None]
        feats = [ramp, ramp[:, ::2, ::2], ramp[:, ::4, ::4], ramp[:, ::8, ::8]]
        # box on level p2 (stride 4): image coords -> level coords /4
        boxes = jnp.array([[8.0, 8.0, 40.0, 40.0]], jnp.float32)
        levels = jnp.array([2], jnp.int32)
        out = np.asarray(roi_align_pyramid(feats, boxes, levels, output_size=4))
        # x level-coords span 2..10 -> values ~x; each row identical
        assert np.allclose(out[0, 0, :, 0], out[0, 3, :, 0], atol=1e-5)
        diffs = np.diff(out[0, 0, :, 0])
        assert np.all(diffs > 0)
        assert np.allclose(diffs, diffs[0], atol=1e-5)


class TestRCNNWrapper:
    @pytest.fixture(scope="class")
    def wrapper(self):
        return FasterRCNNFPN(resize_input=False)

    @pytest.mark.slow
    def test_resize_shortest_edge_sfu_geometry(self):
        """BasketballDrill 832x480 -> capped scale -> padded 800x1344 ->
        p2 [200,336] (matches data/mpeg-fcm/SFUHW/fpn-sizes fixtures)."""
        w = FasterRCNNFPN(resize_input=True)
        img = np.zeros((480, 832, 3), np.uint8)
        resized = w.resize_shortest_edge(img)
        assert resized.shape[1] == 1333  # capped by max_size_test
        padded, (h, ww) = w.preprocess(resized[None])
        assert padded.shape[1:3] == (800, 1344)
        assert (h, ww) == (resized.shape[0], 1333)

    def test_split_roundtrip_shapes(self, wrapper):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        feats = wrapper.input_to_features([{"image_bgr": img}])
        assert set(feats["data"].keys()) == {"p2", "p3", "p4", "p5"}
        assert feats["data"]["p2"].shape == (1, 256, 16, 24)
        assert feats["data"]["p5"].shape == (1, 256, 2, 3)

        results = wrapper.features_to_output(feats)
        assert len(results) == 1
        r = results[0]
        assert r["boxes"].ndim == 2 and r["boxes"].shape[1] == 4
        assert len(r["scores"]) == len(r["classes"]) == len(r["boxes"])


class TestX101:
    @pytest.mark.slow
    def test_x101_backbone_shapes(self):
        """ResNeXt-101 32x8d split halves (tiny input, grouped convs)."""
        from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNX101

        w = FasterRCNNX101(resize_input=False)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        feats = w.input_to_features([{"image_bgr": img}])
        assert feats["data"]["p2"].shape == (1, 256, 16, 24)
        results = w.features_to_output(feats)
        assert len(results) == 1


class TestMatrixNMSEquivalence:
    def test_matches_sequential_greedy_reference(self):
        """Iterative matrix NMS must equal classic greedy NMS exactly."""
        rng = np.random.default_rng(0)
        for trial in range(5):
            n = 200
            centers = rng.uniform(0, 100, (n, 2))
            wh = rng.uniform(5, 30, (n, 2))
            boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1)
            scores = rng.uniform(0, 1, n)
            scores[rng.random(n) < 0.1] = -np.inf  # some invalid

            # numpy sequential greedy
            def greedy(boxes, scores, t):
                order = np.argsort(-scores)
                keep, suppressed = [], np.zeros(n, bool)
                for i in order:
                    if suppressed[i] or scores[i] == -np.inf:
                        continue
                    keep.append(i)
                    xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
                    yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
                    xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
                    yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
                    inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
                    a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                    ai = a[i]
                    iou = inter / np.maximum(ai + a - inter, 1e-12)
                    suppressed |= iou > t
                return keep

            expect = greedy(boxes, scores, 0.5)
            keep, valid = nms_fixed(
                jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
                0.5, 50,
            )
            got = np.asarray(keep)[np.asarray(valid)]
            assert list(got) == expect[: len(got)], f"trial {trial}"
