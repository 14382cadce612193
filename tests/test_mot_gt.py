"""Generator ground truth for the MOT artifact (scripts/train_jde_head_sup.py).

The MOTA-vs-rate artifact's labels come from replaying the procedural
motion-clip generator (scripts/make_motion_features.py) — these tests pin
the two properties the protocol depends on: box extraction consumes no RNG
draws (frames stay bit-identical to older callers'), and the YOLO target
builder writes one positive anchor per gt at the correct cell with an
invertible box parameterization (models/darknet.py decode_yolo link).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from make_motion_features import motion_clip  # noqa: E402
from train_jde_head_sup import build_targets  # noqa: E402


def test_return_boxes_preserves_frames():
    f1 = motion_clip(np.random.default_rng(7), 4, 64, 96)
    f2, boxes = motion_clip(np.random.default_rng(7), 4, 64, 96, return_boxes=True)
    assert len(f1) == len(f2) == len(boxes) == 4
    for a, b in zip(f1, f2):
        assert np.array_equal(a, b)
    # every frame has at least one visible object at this size
    assert all(len(fb) >= 1 for fb in boxes)
    # tlwh boxes centred on screen: inside the padded frame bounds
    for fb in boxes:
        for oid, x, y, w, h in fb:
            assert w > 0 and h > 0
            assert x + w > 0 and y + h > 0 and x < 96 and y < 64


def test_object_ids_stable_across_frames():
    _, boxes = motion_clip(np.random.default_rng(3), 6, 64, 96, return_boxes=True)
    ids0 = {oid for oid, *_ in boxes[0]}
    for fb in boxes[1:]:
        # ids never appear from nowhere: subset of the clip's object set
        assert {oid for oid, *_ in fb} <= set(range(16))
    assert ids0


def test_build_targets_geometry():
    from lmsfc_tpu.models.darknet import JDE_ANCHORS

    h, w = 320, 576
    # one gt box per frame, known geometry
    gt = [[(5, 100.0, 80.0, 64.0, 48.0)], [(6, 300.0, 150.0, 30.0, 90.0)]]
    t = build_targets(gt, (h, w), 128)
    for s in (8, 16, 32):
        d = t[s]
        assert d["conf"].shape == (2, h // s, w // s, 4)
        # exactly one positive anchor per frame per stride
        assert d["conf"].sum() == 2.0
        for fi, boxes in enumerate(gt):
            oid, x, y, bw, bh = boxes[0]
            cx, cy = x + bw / 2, y + bh / 2
            gx, gy = int(cx / s), int(cy / s)
            a = int(np.argmax(d["conf"][fi, gy, gx]))
            assert d["conf"][fi, gy, gx, a] == 1.0
            assert d["has"][fi, gy, gx] == 1.0
            assert d["bid"][fi, gy, gx] == oid
            # invert the YOLO link: decode target -> original box
            sx, sy, tw, th = d["box"][fi, gy, gx, a]
            aw, ah = JDE_ANCHORS[s][a]
            assert (sx + gx) * s == pytest.approx(cx, abs=1e-3)
            assert (sy + gy) * s == pytest.approx(cy, abs=1e-3)
            assert np.exp(tw) * aw == pytest.approx(bw, rel=1e-5)
            assert np.exp(th) * ah == pytest.approx(bh, rel=1e-5)


def test_build_targets_best_anchor_is_iou_argmax():
    from lmsfc_tpu.models.darknet import JDE_ANCHORS

    # a tall thin box should pick a tall anchor, wide box a wide-ish one
    gt = [[(0, 50.0, 50.0, 16.0, 48.0)]]
    t = build_targets(gt, (320, 576), 8)
    d = t[8]
    a = int(np.argmax(d["conf"][0].sum(axis=(0, 1))))
    anchors = np.asarray(JDE_ANCHORS[8], np.float32)
    inter = np.minimum(anchors[:, 0], 16.0) * np.minimum(anchors[:, 1], 48.0)
    union = anchors.prod(1) + 16.0 * 48.0 - inter
    assert a == int(np.argmax(inter / union))
