"""Quantify the ROIAlign fixed-2x2 vs Detectron2 adaptive-sampling delta
(VERDICT r1 weak #4 / next-round #6).

Detectron2's ROIAlignV2 with sampling_ratio=0 uses ceil(roi_size_px / P)
sample points per bin axis; ops/roi_align.py uses a fixed 2x2 grid to keep
XLA shapes static. This test measures the numeric gap with an exact numpy
re-implementation of BOTH samplings on synthetic features/boxes:

  * ROIs whose level-coord bins need <=2 samples (the size range FPN level
    assignment actually produces: sqrt(area)/stride ~ 14px for P=7) must
    match the adaptive reference almost exactly;
  * oversized ROIs (bins > 2px, only reachable for boxes >~450px pinned at
    level 5) are allowed a bounded smoothing delta, and the measured value
    is asserted so the deviation stays quantified rather than anecdotal.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from lmsfc_tpu.ops.roi_align import assign_levels, roi_align_pyramid


def _bilinear_np(feat, y, x):
    """feat [H,W,C]; D2-style clamped bilinear at continuous (y, x)."""
    H, W, _ = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1], feat.dtype)
    y0, x0 = math.floor(y), math.floor(x)
    wy1, wx1 = y - y0, x - x0
    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            yc = min(max(y0 + dy, 0), H - 1)
            xc = min(max(x0 + dx, 0), W - 1)
            out = out + feat[yc, xc] * (wy * wx)
    return out


def _roi_align_np(feat, box, stride, P=7, sampling=0):
    """Exact numpy ROIAlignV2 (aligned=True). sampling=0 -> adaptive
    ceil(roi/P); sampling=k -> fixed kxk."""
    x1, y1, x2, y2 = (b / stride for b in box)
    bw, bh = max(x2 - x1, 1e-6), max(y2 - y1, 1e-6)
    out = np.zeros((P, P, feat.shape[-1]), np.float64)
    for i in range(P):
        for j in range(P):
            sy = sampling if sampling > 0 else max(1, math.ceil(bh / P))
            sx = sampling if sampling > 0 else max(1, math.ceil(bw / P))
            acc = 0.0
            for a in range(sy):
                for b in range(sx):
                    yy = y1 + bh * (i + (a + 0.5) / sy) / P - 0.5
                    xx = x1 + bw * (j + (b + 0.5) / sx) / P - 0.5
                    acc = acc + _bilinear_np(feat, yy, xx)
            out[i, j] = acc / (sy * sx)
    return out


@pytest.fixture(scope="module")
def pyramid():
    rng = np.random.default_rng(0)
    feats = []
    h, w = 64, 80
    for _ in range(4):
        feats.append(rng.normal(0, 1, (1, h, w, 8)).astype(np.float32))
        h, w = h // 2, w // 2
    return feats


def _run_delta(pyramid, boxes):
    boxes_j = jnp.asarray(boxes, jnp.float32)
    levels = assign_levels(boxes_j)
    got = np.asarray(
        roi_align_pyramid([jnp.asarray(f) for f in pyramid], boxes_j, levels)
    )
    deltas = []
    for r, box in enumerate(boxes):
        lvl = int(levels[r]) - 2
        ref = _roi_align_np(pyramid[lvl][0], box, 2 ** (lvl + 2), sampling=0)
        scale = np.abs(ref).mean() + 1e-9
        deltas.append(np.abs(got[r] - ref).max() / scale)
    return np.asarray(deltas)


def test_typical_rois_match_adaptive(pyramid):
    """All ROIs needing <= max_sampling (4) points per bin axis — i.e. every
    box up to ~900px — now match D2's adaptive rule exactly; the residual is
    the bf16 quantization of the gather source (<~2% of mean |activation|
    on N(0,1) noise features, the worst case)."""
    rng = np.random.default_rng(1)
    boxes = []
    for _ in range(24):
        size = rng.uniform(32, 370)
        x1 = rng.uniform(0, 300 - size / 2)
        y1 = rng.uniform(0, 240 - size / 2)
        boxes.append([x1, y1, x1 + size, y1 + size * rng.uniform(0.7, 1.4)])
    deltas = _run_delta(pyramid, np.asarray(boxes))
    assert deltas.max() < 0.05, f"typical-ROI delta {deltas.max():.2e}"


def test_oversized_rois_delta_bounded():
    """Boxes needing >4 samples/bin (>~900px at level 5) get the capped
    4x4 average of the same bilinear surface: bounded smoothing delta.
    A larger pyramid keeps the boxes inside the image coverage (out-of-
    bounds sampling is a separate concern, tested above)."""
    rng = np.random.default_rng(3)
    feats = []
    h, w = 384, 416
    for _ in range(4):
        # spatially smooth features (what conv backbones actually emit):
        # low-frequency sinusoid mixture + 10% noise. On pure white noise the
        # sub-sample gap of ANY finite grid is unboundedly large relative to
        # the bin mean, so noise is not a meaningful reference here.
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack(
            [
                np.sin(yy / (7 + c) + c) * np.cos(xx / (9 + c) - c)
                for c in range(8)
            ],
            axis=-1,
        )
        feats.append((base + 0.1 * rng.normal(0, 1, base.shape))[None].astype(np.float32))
        h, w = h // 2, w // 2
    boxes = np.asarray(
        [
            [10, 10, 1210, 910],    # s=6 needed per axis, capped at 4
            [40, 20, 1340, 1120],
        ],
        np.float32,
    )
    deltas = _run_delta(feats, boxes)
    # quantified deviation of the s<=4 cap on smooth features
    assert deltas.max() < 0.05, f"oversized-ROI delta {deltas.max():.2e}"


def test_fixed_sampling_path_unchanged(pyramid):
    """The fast fixed-2x2 path stays available and matches its own numpy
    reference (sampling=2)."""
    boxes = np.asarray([[20, 16, 120, 100], [5, 5, 200, 150]], np.float32)
    boxes_j = jnp.asarray(boxes)
    levels = assign_levels(boxes_j)
    got = np.asarray(
        roi_align_pyramid(
            [jnp.asarray(f) for f in pyramid], boxes_j, levels, sampling=2
        )
    )
    for r, box in enumerate(boxes):
        lvl = int(levels[r]) - 2
        ref = _roi_align_np(pyramid[lvl][0], box, 2 ** (lvl + 2), sampling=2)
        scale = np.abs(ref).mean() + 1e-9
        assert np.abs(got[r] - ref).max() / scale < 0.05
