"""ROIAlign (aligned / v2) over an FPN pyramid — XLA gather formulation.

Replaces Detectron2's CUDA ROIAlign (SURVEY.md §2.10). TPU-first design: all
pyramid levels are flattened into ONE [sum(H_l*W_l), C] buffer; each ROI's
assigned level picks a (row-offset, H, W, stride) tuple; bilinear sampling
becomes 4 gathers into the flat buffer with computed indices. Static shapes
throughout — R rois x (pool*2)^2 sample points.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def assign_levels(
    boxes: jax.Array, min_level: int = 2, max_level: int = 5, canonical: int = 224
) -> jax.Array:
    """FPN level per box: floor(4 + log2(sqrt(area)/224)), clamped (D2 rule)."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / canonical + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def roi_align_pyramid(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    levels: jax.Array,
    output_size: int = 7,
    min_level: int = 2,
    sampling: int = 2,
) -> jax.Array:
    """features: list [1,H_l,W_l,C] for levels min_level..; boxes [R,4] image
    coords; levels [R]. Returns [R, output_size, output_size, C].

    Aligned bilinear sampling with a fixed `sampling`^2 grid per bin
    (Detectron2 v2 uses adaptive sampling_ratio=0; a fixed 2x2 grid matches
    it for the typical ROI sizes and keeps shapes static).
    """
    C = features[0].shape[-1]
    hs = [f.shape[1] for f in features]
    ws = [f.shape[2] for f in features]
    # bf16 gather source (measured ~on par with f32 on v5e — the sampling is
    # gather-index-rate-bound, not bandwidth-bound; kept for the HBM savings.
    # weights/accumulation stay f32)
    flat = jnp.concatenate(
        [f.reshape(-1, C) for f in features], axis=0
    ).astype(jnp.bfloat16)
    offsets = [0]
    for h, w in zip(hs, ws):
        offsets.append(offsets[-1] + h * w)
    offsets_arr = jnp.asarray(offsets[:-1], jnp.int32)
    hs_arr = jnp.asarray(hs, jnp.int32)
    ws_arr = jnp.asarray(ws, jnp.int32)
    strides_arr = jnp.asarray(
        [2**(min_level + i) for i in range(len(features))], jnp.float32
    )

    lvl_idx = levels - min_level
    stride = strides_arr[lvl_idx]  # [R]
    off = offsets_arr[lvl_idx]
    H = hs_arr[lvl_idx]
    W = ws_arr[lvl_idx]

    R = boxes.shape[0]
    P = output_size
    S = sampling

    # per-roi box in level coords (aligned: subtract half pixel later)
    x1 = boxes[:, 0] / stride
    y1 = boxes[:, 1] / stride
    x2 = boxes[:, 2] / stride
    y2 = boxes[:, 3] / stride
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    # sample grid: for bin (i,j), sample positions evenly spaced
    g = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / S  # in bin units over P bins
    sy = y1[:, None] + bh[:, None] * (g[None, :] / P)  # [R, P*S]
    sx = x1[:, None] + bw[:, None] * (g[None, :] / P)

    # aligned=True: shift by 0.5 (continuous coords -> pixel centers)
    sy = sy - 0.5
    sx = sx - 0.5

    def bilinear(sy, sx, off, H, W):
        # sy [P*S], sx [P*S] for one roi
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        wy1 = sy - y0
        wx1 = sx - x0
        wy0 = 1.0 - wy1
        wx0 = 1.0 - wx1

        def at(yi, xi):
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            inb = (yi >= -1) & (yi <= H) & (xi >= -1) & (xi <= W)
            idx = off + yc * W + xc
            return flat[idx] * inb[..., None]

        # outer product over the sample grid: vals [P*S, P*S, C]
        v00 = at(y0[:, None], x0[None, :])
        v01 = at(y0[:, None], x0[None, :] + 1)
        v10 = at(y0[:, None] + 1, x0[None, :])
        v11 = at(y0[:, None] + 1, x0[None, :] + 1)
        w00 = (wy0[:, None] * wx0[None, :])[..., None]
        w01 = (wy0[:, None] * wx1[None, :])[..., None]
        w10 = (wy1[:, None] * wx0[None, :])[..., None]
        w11 = (wy1[:, None] * wx1[None, :])[..., None]
        vals = (
            v00.astype(jnp.float32) * w00
            + v01.astype(jnp.float32) * w01
            + v10.astype(jnp.float32) * w10
            + v11.astype(jnp.float32) * w11
        )  # [PS, PS, C]
        # average each SxS sample block into its bin
        vals = vals.reshape(P, S, P, S, C).mean(axis=(1, 3))
        return vals  # [P, P, C]

    return jax.vmap(bilinear)(sy, sx, off, H, W)
