"""Instance-mask utilities: 28x28 paste, COCO RLE codec, polygon rasterize.

Replaces the pycocotools mask dependencies of the reference's evaluators
(SURVEY.md §2.10; RLE b64 decode at datasets/image.py:56-67, mask handling
in evaluators/evaluators.py:235-286) with numpy/cv2 implementations:

  * paste_mask — Mask R-CNN head output (28x28 prob) -> full-image binary
  * rle_encode/rle_decode — COCO compressed RLE (LEB128-ish ascii counts),
    column-major order, bit-compatible with pycocotools strings
  * polygons_to_mask — COCO polygon segmentation rasterization
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import cv2
import numpy as np


def paste_mask(
    mask28: np.ndarray, box_xyxy: Sequence[float], height: int, width: int,
    threshold: float = 0.5,
) -> np.ndarray:
    """Resize a head-output probability mask into its box on a blank canvas."""
    x1, y1, x2, y2 = [int(round(v)) for v in box_xyxy]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, width), min(y2, height)
    out = np.zeros((height, width), np.uint8)
    if x2 <= x1 or y2 <= y1:
        return out
    resized = cv2.resize(
        mask28.astype(np.float32), (x2 - x1, y2 - y1), interpolation=cv2.INTER_LINEAR
    )
    out[y1:y2, x1:x2] = (resized >= threshold).astype(np.uint8)
    return out


# ---------------------------------------------------------------- COCO RLE
def rle_encode(mask: np.ndarray) -> Dict:
    """Binary HxW mask -> {'size': [h,w], 'counts': ascii str} (compressed
    RLE, column-major runs, pycocotools-compatible)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).ravel(order="F")
    # run lengths, starting with a (possibly zero-length) run of 0s
    diffs = np.nonzero(np.diff(flat))[0] + 1
    boundaries = np.concatenate([[0], diffs, [flat.size]])
    runs = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs

    # LEB128-style signed varint ascii encoding (pycocotools rleToString)
    s = []
    for i, cnt in enumerate(runs):
        x = int(cnt)
        if i > 2:
            x -= int(runs[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return {"size": [h, w], "counts": "".join(s)}


def rle_decode(rle: Dict) -> np.ndarray:
    """Inverse of rle_encode. Accepts str or bytes counts; also accepts
    uncompressed {'counts': [int, ...]}."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (list, tuple)):
        runs = list(counts)
    else:
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        runs = []
        i = 0
        while i < len(counts):
            x = 0
            k = 0
            more = True
            while more:
                c = ord(counts[i]) - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                i += 1
                if not more and (c & 0x10):
                    x |= -1 << (5 * (k + 1))
                k += 1
            if len(runs) > 2:
                x += runs[-2]
            runs.append(int(x))
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for r in runs:
        if val:
            flat[pos : pos + r] = 1
        pos += r
        val ^= 1
    return flat.reshape((h, w), order="F")


def polygons_to_mask(polygons: List[Sequence[float]], height: int, width: int) -> np.ndarray:
    mask = np.zeros((height, width), np.uint8)
    pts = [
        np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def decode_segmentation(seg: Union[Dict, List], height: int, width: int) -> np.ndarray:
    """COCO annotation 'segmentation' field -> binary mask."""
    if isinstance(seg, dict):
        return rle_decode(seg)
    return polygons_to_mask(seg, height, width)


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter / union) if union else 0.0


def rle_from_base64(b64_counts: str, size) -> np.ndarray:
    """Decode a base64-wrapped compressed-RLE mask (the OIV6 annotation
    format the reference handles at datasets/image.py:56-67 and
    evaluators/evaluators.py RLE b64 paths)."""
    import base64
    import zlib

    raw = base64.b64decode(b64_counts)
    try:
        raw = zlib.decompress(raw)
    except zlib.error:
        pass  # plain (non-zlib) counts
    return rle_decode({"size": list(size), "counts": raw.decode("ascii")})
