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


def encode_boxes(
    boxes: jax.Array, anchors: jax.Array, weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
) -> jax.Array:
    """Inverse of decode_boxes: (dx,dy,dw,dh) targets that map anchors ->
    boxes (Detectron2 Box2BoxTransform.get_deltas). [..., 4] -> [..., 4]."""
    wx, wy, ww, wh = weights
    ax1, ay1, ax2, ay2 = jnp.split(anchors, 4, axis=-1)
    aw = jnp.maximum(ax2 - ax1, 1e-6)
    ah = jnp.maximum(ay2 - ay1, 1e-6)
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah
    bx1, by1, bx2, by2 = jnp.split(boxes, 4, axis=-1)
    bw = jnp.maximum(bx2 - bx1, 1e-6)
    bh = jnp.maximum(by2 - by1, 1e-6)
    bcx = bx1 + 0.5 * bw
    bcy = by1 + 0.5 * bh
    return jnp.concatenate(
        [
            wx * (bcx - acx) / aw,
            wy * (bcy - acy) / ah,
            ww * jnp.log(bw / aw),
            wh * jnp.log(bh / ah),
        ],
        axis=-1,
    )


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
    """EXACT greedy NMS over a FIXED box count; returns
    (keep_indices[max_out] score-ordered, valid mask).

    Instead of max_out sequential scan steps (latency-bound on TPU), the
    greedy fixpoint is computed by iterating a parallel matrix rule:
      kept     <- undecided boxes whose higher-score overlaps are ALL rejected
      rejected <- undecided boxes overlapped by any kept box
    Each pass finalizes one layer of the suppression DAG, so the loop runs
    depth(chain) times (typically < 10, never more than N), with O(N^2)
    vectorized work per pass. Produces exactly the classic
    highest-score-first result. Scores of invalid boxes must be -inf.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    finite = scores > -jnp.inf
    # strict score order with index tiebreak (greedy processes by score)
    idx = jnp.arange(n)
    higher = (scores[None, :] > scores[:, None]) | (
        (scores[None, :] == scores[:, None]) & (idx[None, :] < idx[:, None])
    )
    conflict = higher & (iou > iou_threshold) & finite[None, :] & finite[:, None]

    # state: 0 undecided, 1 kept, 2 rejected (invalid boxes start rejected)
    state0 = jnp.where(finite, 0, 2)

    def cond(state):
        return jnp.any(state == 0)

    def body(state):
        undecided = state == 0
        rejected = state == 2
        kept = state == 1
        # all higher-score conflicts already rejected -> keep
        blocked = jnp.any(conflict & ~rejected[None, :], axis=1)
        new_kept = undecided & ~blocked
        kept = kept | new_kept
        # overlapped by any kept higher-score box -> reject
        new_rej = undecided & jnp.any(conflict & kept[None, :], axis=1)
        return jnp.where(new_kept, 1, jnp.where(new_rej, 2, state))

    state = jax.lax.while_loop(cond, body, state0)
    kept = state == 1
    kept_scores = jnp.where(kept, scores, -jnp.inf)
    top_scores, keep_idx = jax.lax.top_k(kept_scores, max_out)
    valid = top_scores > -jnp.inf
    return jnp.where(valid, keep_idx, -1), valid


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
