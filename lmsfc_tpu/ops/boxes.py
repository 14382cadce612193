"""Box operations: decode, clip, IoU, fixed-size greedy NMS — all XLA-friendly.

Replaces the CUDA NMS/box ops the reference pulls in through Detectron2 and
cython_bbox (SURVEY.md §2.10): static shapes + masking instead of dynamic
filtering (SURVEY.md §7 hard part 2).

Boxes are [x1, y1, x2, y2] in pixels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_SCALE_CLAMP = 4.135166556742356  # log(1000/16), Detectron2's delta clamp


def decode_boxes(
    deltas: jax.Array, anchors: jax.Array, weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
) -> jax.Array:
    """Apply (dx,dy,dw,dh) deltas to anchors/proposals. [..., 4] -> [..., 4]."""
    wx, wy, ww, wh = weights
    ax1, ay1, ax2, ay2 = jnp.split(anchors, 4, axis=-1)
    aw = ax2 - ax1
    ah = ay2 - ay1
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah

    dx, dy, dw, dh = jnp.split(deltas, 4, axis=-1)
    dx, dy = dx / wx, dy / wy
    dw = jnp.minimum(dw / ww, _SCALE_CLAMP)
    dh = jnp.minimum(dh / wh, _SCALE_CLAMP)

    cx = dx * aw + acx
    cy = dy * ah + acy
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def clip_boxes(boxes: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    h, w = hw
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_area(boxes: jax.Array) -> jax.Array:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU: a [N,4], b [M,4] -> [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_fixed(
    boxes: jax.Array, scores: jax.Array, iou_threshold: float, max_out: int
) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS over a FIXED box count; returns (keep_indices[max_out], valid mask).

    Scores of suppressed/invalid boxes must be -inf. O(N^2) IoU matrix + a
    scan of max_out greedy picks — MXU/VPU friendly, no dynamic shapes.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(carry, _):
        live_scores = carry
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > -jnp.inf
        # suppress overlapping + the chosen one
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best
        )
        new_scores = jnp.where(valid & suppress, -jnp.inf, live_scores)
        return new_scores, (jnp.where(valid, best, -1), valid)

    _, (keep, valid) = jax.lax.scan(body, scores, None, length=max_out)
    return keep, valid


def batched_nms_fixed(
    boxes: jax.Array,
    scores: jax.Array,
    idxs: jax.Array,
    iou_threshold: float,
    max_out: int,
) -> Tuple[jax.Array, jax.Array]:
    """Category-aware NMS via the coordinate-offset trick (torchvision-style)."""
    max_coord = jnp.max(boxes) + 1
    offsets = idxs.astype(boxes.dtype)[:, None] * max_coord
    return nms_fixed(boxes + offsets, scores, iou_threshold, max_out)
