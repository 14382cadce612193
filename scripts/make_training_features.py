"""Generate FPN feature dumps for RD training.

The reference trains L-MSFC on NN-Part1 features exported from real images
(SURVEY.md §2.9; feature dumping via `generate_features_only`). This script
produces the same artifact without the (absent) vision datasets: procedural
natural-statistics images (multi-octave smooth noise + geometric objects +
gradients, 1/f-like spectra) are pushed through the REAL Faster R-CNN NN1
(`input_to_features`) and the resulting {p2..p5} pyramids are written as
`*_features.npz` in the exact format the pipelines' feature cache uses
(pipelines/base.py) and FeatureDumpSource consumes.

Real Detectron2 weights are used when --weights points at a converted
pickle; otherwise the seeded random backbone still yields spatially
correlated, multi-scale features (convolutions of structured images), which
is what the codec's R-D behaviour depends on — unlike i.i.d. gaussian
SyntheticSource features, these are compressible.

Usage:
  python scripts/make_training_features.py --out data/train_features \
      --n 96 --hw 512 768 [--weights path.pkl] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _upsample2d(a: np.ndarray, shape) -> np.ndarray:
    """Bilinear upsample [h,w] -> shape, numpy-only."""
    h, w = a.shape
    H, W = shape
    y = np.linspace(0, h - 1, H)
    x = np.linspace(0, w - 1, W)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 2)
    wy = (y - y0)[:, None]
    wx = (x - x0)[None, :]
    a00 = a[y0][:, x0]
    a01 = a[y0][:, x0 + 1]
    a10 = a[y0 + 1][:, x0]
    a11 = a[y0 + 1][:, x0 + 1]
    return (
        a00 * (1 - wy) * (1 - wx)
        + a01 * (1 - wy) * wx
        + a10 * wy * (1 - wx)
        + a11 * wy * wx
    )


def procedural_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """BGR uint8 [h,w,3] with natural-image-like statistics."""
    img = np.zeros((h, w, 3), np.float32)
    # 1/f multi-octave value noise per channel (shared luminance + chroma)
    luma = np.zeros((h, w), np.float32)
    for octave in range(6):
        gh, gw = max(2, h >> (7 - octave)), max(2, w >> (7 - octave))
        amp = 0.6 ** octave
        luma += amp * _upsample2d(rng.normal(0, 1, (gh, gw)).astype(np.float32), (h, w))
    luma = (luma - luma.min()) / (np.ptp(luma) + 1e-6)
    base = rng.uniform(40, 200, 3).astype(np.float32)
    img += base[None, None, :] * (0.4 + 0.9 * luma[..., None])

    # geometric objects: filled rectangles / ellipses with distinct colors
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(int(rng.integers(6, 14))):
        color = rng.uniform(0, 255, 3).astype(np.float32)
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        ry, rx = rng.uniform(h * 0.03, h * 0.25), rng.uniform(w * 0.03, w * 0.25)
        if rng.random() < 0.5:
            mask = (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
        else:
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        alpha = rng.uniform(0.5, 1.0)
        img[mask] = (1 - alpha) * img[mask] + alpha * color[None, :]

    # global illumination gradient + sensor noise
    gdir = rng.uniform(-1, 1, 2)
    grad = (gdir[0] * yy / h + gdir[1] * xx / w) * rng.uniform(0, 60)
    img += grad[..., None]
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--weights", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", default="faster_rcnn_R_50_FPN_3x")
    ap.add_argument("--no-compress", action="store_true",
                    help="plain npz (much faster writes; ~4x the disk)")
    args = ap.parse_args()

    from lmsfc_tpu.registry import VISIONMODELS
    import lmsfc_tpu.plugins  # noqa: F401  (registers models)

    model = VISIONMODELS[args.arch](weights=args.weights, resize_input=False)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    h, w = args.hw

    stats = {"min": np.inf, "max": -np.inf}
    for i in range(args.n):
        img = procedural_image(rng, h, w)
        feats = model.input_to_features([{"image_bgr": img}])
        arrays = {k: np.asarray(v, np.float32) for k, v in feats["data"].items()}
        saver = np.savez if args.no_compress else np.savez_compressed
        saver(
            out / f"img{i:04d}_features.npz",
            _meta=json.dumps({k: v for k, v in feats.items() if k != "data"}, default=str),
            **arrays,
        )
        for a in arrays.values():
            stats["min"] = min(stats["min"], float(a.min()))
            stats["max"] = max(stats["max"], float(a.max()))
        if (i + 1) % 16 == 0:
            print(f"{i+1}/{args.n} dumped (range [{stats['min']:.3f}, {stats['max']:.3f}])")

    (out / "stats.json").write_text(json.dumps(stats, indent=2))
    print(f"done: {args.n} dumps in {out}, feature range "
          f"[{stats['min']:.4f}, {stats['max']:.4f}]")


if __name__ == "__main__":
    main()
