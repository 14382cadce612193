"""BGR <-> YUV420 conversions (BT.601 limited range), numpy.

Replaces the reference's ffmpeg-subprocess PNG->YUV conversions for the
image-domain (remote-inference) codec path (ref codecs/std_codecs.py:292-355
`convert_input_to_yuv`): same colorimetry as ffmpeg's default yuv420p path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def bgr_to_yuv420(img_bgr: np.ndarray, bitdepth: int = 10) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """uint8 BGR HWC -> (Y, U, V) planes at the given bitdepth (limited range)."""
    b = img_bgr[..., 0].astype(np.float64)
    g = img_bgr[..., 1].astype(np.float64)
    r = img_bgr[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * 0.564 + 128.0
    v = (r - y) * 0.713 + 128.0
    y = 16.0 + y * 219.0 / 255.0
    u = 16.0 + (u - 128.0) * 224.0 / 255.0 + 112.0
    v = 16.0 + (v - 128.0) * 224.0 / 255.0 + 112.0
    scale = (1 << bitdepth) / 256.0
    maxv = (1 << bitdepth) - 1
    yq = np.clip(np.round(y * scale), 0, maxv)
    # 420 subsample: average 2x2
    uq = np.clip(np.round(_sub2(u) * scale), 0, maxv)
    vq = np.clip(np.round(_sub2(v) * scale), 0, maxv)
    dtype = np.uint16 if bitdepth > 8 else np.uint8
    return yq.astype(dtype), uq.astype(dtype), vq.astype(dtype)


def yuv420_to_bgr(y: np.ndarray, u: np.ndarray, v: np.ndarray, bitdepth: int = 10) -> np.ndarray:
    scale = 256.0 / (1 << bitdepth)
    yf = y.astype(np.float64) * scale
    uf = _up2(u.astype(np.float64), y.shape) * scale
    vf = _up2(v.astype(np.float64), y.shape) * scale
    yf = (yf - 16.0) * 255.0 / 219.0
    uf = (uf - 128.0) * 255.0 / 224.0
    vf = (vf - 128.0) * 255.0 / 224.0
    r = yf + vf / 0.713
    b = yf + uf / 0.564
    g = (yf - 0.299 * r - 0.114 * b) / 0.587
    out = np.stack([b, g, r], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _sub2(p: np.ndarray) -> np.ndarray:
    h, w = p.shape
    h2, w2 = h - h % 2, w - w % 2
    q = p[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    return q


def _up2(p: np.ndarray, target_hw: Tuple[int, int]) -> np.ndarray:
    q = np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)
    return q[: target_hw[0], : target_hw[1]]
