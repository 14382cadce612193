"""Channel-to-frame tiling and feature-pyramid packing.

Reproduces the reference's packing *geometry* bit-for-bit while vectorizing
over the frame axis (the reference loops frames in Python):

  * compute_frame_resolution — near-square channel factorization
    (ref model_wrappers/utils.py:44-62)
  * tensor_to_tiled / tiled_to_tensor — reshape+swapaxes mosaics
    (ref model_wrappers/utils.py:65-97), here on [N,C,H,W] batches at once
  * pack_feature_dict_to_frames / unpack_frames_to_feature_dict — stack the
    per-level mosaics vertically into one single-channel frame per input
    frame; the FIRST level's frame width is the base and coarser levels are
    re-laid-out to that width via `rescale = fixedW // frmW`
    (ref model_wrappers/detectron2.py:183-270; JDE variant sorts levels by
    width descending instead of anchoring on 'p2', ref jde.py:431-516)

All functions are jnp-traceable (static shapes) so they can live inside a jit
region next to the codec transforms.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def compute_frame_resolution(num_channels: int, channel_height: int, channel_width: int) -> Tuple[int, int]:
    short_edge = int(math.sqrt(num_channels))
    while (num_channels % short_edge) != 0:
        short_edge -= 1
    long_edge = num_channels // short_edge
    if channel_height > channel_width:
        return short_edge * channel_height, long_edge * channel_width
    return long_edge * channel_height, short_edge * channel_width


def tensor_to_tiled(x: jax.Array, tiled_resolution: Tuple[int, int]) -> jax.Array:
    """[N, C, H, W] -> [N, frmH, frmW] channel mosaic (row-major channels)."""
    n, c, h, w = x.shape
    frm_h, frm_w = tiled_resolution
    ch_in_h, ch_in_w = frm_h // h, frm_w // w
    assert ch_in_h * ch_in_w == c, (c, tiled_resolution, (h, w))
    a = x.reshape(n, ch_in_h, ch_in_w, h, w)
    b = jnp.swapaxes(a, 2, 3)  # [n, ch_h, h, ch_w, w]
    return b.reshape(n, frm_h, frm_w)


def tiled_to_tensor(x: jax.Array, channel_resolution: Tuple[int, int]) -> jax.Array:
    """[N, frmH, frmW] -> [N, C, H, W] inverse of tensor_to_tiled."""
    n, frm_h, frm_w = x.shape
    h, w = channel_resolution
    ch_in_h, ch_in_w = frm_h // h, frm_w // w
    a = x.reshape(n, ch_in_h, h, ch_in_w, w)
    b = jnp.swapaxes(a, 2, 3)
    return b.reshape(n, ch_in_h * ch_in_w, h, w)


def packing_plan(
    shapes: Dict[str, Tuple[int, int, int, int]], anchor: str = "first"
) -> Tuple[Dict[str, Tuple[int, int]], List[str]]:
    """Compute per-level (subframe_height, subframe_width) and level order.

    `anchor="first"` matches the R-CNN path: the first level in dict order
    ('p2') fixes the frame width. `anchor="widest"` matches the JDE path:
    levels are laid out in decreasing tile-width order.
    """
    keys = list(shapes.keys())
    if anchor == "widest":
        keys = sorted(
            keys,
            key=lambda k: -compute_frame_resolution(shapes[k][1], shapes[k][2], shapes[k][3])[1],
        )
    base_key = keys[0]
    _, c0, h0, w0 = shapes[base_key]
    _, fixed_w = compute_frame_resolution(c0, h0, w0)
    plan: Dict[str, Tuple[int, int]] = {}
    for k in keys:
        _, c, h, w = shapes[k]
        frm_h, frm_w = compute_frame_resolution(c, h, w)
        rescale = fixed_w // frm_w
        assert rescale >= 1 and frm_w * rescale == fixed_w, (
            f"level {k} tile width {frm_w} does not divide base width {fixed_w}"
        )
        plan[k] = (frm_h // rescale, frm_w * rescale)
    return plan, keys


def pack_feature_dict_to_frames(
    x: Dict[str, jax.Array], anchor: str = "first"
) -> Tuple[jax.Array, Dict[str, Tuple[int, int, int, int]], Dict[str, int]]:
    """Pack {level: [N,C,H,W]} into [N, H_total, W_base] single-channel frames.

    Returns (packed, feature_size, subframe_heights) — same triple as the
    reference's reshape_feature_pyramid_to_frame (detectron2.py:183-236).
    """
    shapes = {k: tuple(v.shape) for k, v in x.items()}
    plan, order = packing_plan(shapes, anchor=anchor)
    tiles = [tensor_to_tiled(x[k], plan[k]) for k in order]
    packed = jnp.concatenate(tiles, axis=1)
    feature_size = {k: (1, shapes[k][1], shapes[k][2], shapes[k][3]) for k in order}
    subframe_heights = {k: plan[k][0] for k in order}
    return packed, feature_size, subframe_heights


def unpack_frames_to_feature_dict(
    packed: jax.Array,
    feature_size: Dict[str, Tuple[int, int, int, int]],
    subframe_heights: Dict[str, int],
) -> Dict[str, jax.Array]:
    """Inverse of pack_feature_dict_to_frames (ref detectron2.py:238-270)."""
    out: Dict[str, jax.Array] = {}
    top = 0
    for key, height in subframe_heights.items():
        sub = packed[:, top : top + height, :]
        top += height
        _, _, h, w = feature_size[key]
        out[key] = tiled_to_tensor(sub, (h, w))
    return out
