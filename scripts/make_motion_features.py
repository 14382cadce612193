"""Generate MOTION clip feature dumps for temporal-codec RD training.

VERDICT r2 item 4: the temporal codec needs a trained sequence-level R-D
artifact. This produces what the env's missing TVD/HiEve videos would:
procedural video clips — a static textured background with moving colored
objects and slow global pan — pushed frame-by-frame through the REAL
Faster R-CNN NN1, written as one npz per clip with [T,C,H,W] per level
(consumed by training.data.FeatureClipDumpSource and the temporal eval).

The temporal redundancy is genuine: consecutive frames share the
background and object shapes; objects translate a few pixels per frame
(ref video workload: video_split_inference.py:86-249 codes [N,C,H,W]
feature sequences of exactly this character).

Usage:
  python scripts/make_motion_features.py --out data/motion_features \
      --clips 12 --frames 12 --hw 512 768 [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from make_training_features import _upsample2d  # scripts/ sibling


def motion_clip(
    rng: np.random.Generator, t: int, h: int, w: int, return_boxes: bool = False
):
    """List of t BGR uint8 frames: textured background + moving objects.

    With return_boxes=True also returns, per frame, the TRUE object boxes as
    a list of (obj_id, x, y, bw, bh) tlwh tuples (objects whose on-screen
    area fraction is < 0.3 are dropped). Box extraction consumes no extra
    RNG draws, so (frames, boxes) for a given rng state are bit-identical
    to the frames an older caller produced — existing dumped datasets can
    recover their ground truth by replaying the generator.
    """
    # background: 1/f noise + illumination gradient (static across the clip)
    luma = np.zeros((h, w), np.float32)
    for octave in range(6):
        gh, gw = max(2, h >> (7 - octave)), max(2, w >> (7 - octave))
        luma += (0.6 ** octave) * _upsample2d(
            rng.normal(0, 1, (gh, gw)).astype(np.float32), (h, w)
        )
    luma = (luma - luma.min()) / (np.ptp(luma) + 1e-6)
    base = rng.uniform(40, 200, 3).astype(np.float32)
    bg = base[None, None, :] * (0.4 + 0.9 * luma[..., None])
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    gdir = rng.uniform(-1, 1, 2)
    bg = bg + ((gdir[0] * yy / h + gdir[1] * xx / w) * rng.uniform(0, 60))[..., None]

    # objects: position + velocity per object (a few px/frame)
    objs = []
    for _ in range(int(rng.integers(5, 10))):
        objs.append({
            "color": rng.uniform(0, 255, 3).astype(np.float32),
            "cy": rng.uniform(0.1 * h, 0.9 * h), "cx": rng.uniform(0.1 * w, 0.9 * w),
            "ry": rng.uniform(h * 0.04, h * 0.18), "rx": rng.uniform(w * 0.04, w * 0.18),
            "vy": rng.uniform(-4, 4), "vx": rng.uniform(-6, 6),
            "ellipse": rng.random() < 0.5,
            "alpha": rng.uniform(0.6, 1.0),
        })
    pan = rng.uniform(-1.5, 1.5, 2)  # global pan px/frame

    frames = []
    boxes = []
    for ti in range(t):
        img = bg.copy()
        frame_boxes = []
        for oid, o in enumerate(objs):
            cy, cx = o["cy"] + o["vy"] * ti + pan[0] * ti, o["cx"] + o["vx"] * ti + pan[1] * ti
            if o["ellipse"]:
                mask = ((yy - cy) / o["ry"]) ** 2 + ((xx - cx) / o["rx"]) ** 2 < 1.0
            else:
                mask = (np.abs(yy - cy) < o["ry"]) & (np.abs(xx - cx) < o["rx"])
            img[mask] = (1 - o["alpha"]) * img[mask] + o["alpha"] * o["color"][None, :]
            x0, y0 = cx - o["rx"], cy - o["ry"]
            bw, bh = 2 * o["rx"], 2 * o["ry"]
            vis_w = min(x0 + bw, w) - max(x0, 0.0)
            vis_h = min(y0 + bh, h) - max(y0, 0.0)
            if vis_w > 0 and vis_h > 0 and (vis_w * vis_h) / (bw * bh) >= 0.3:
                frame_boxes.append((oid, x0, y0, bw, bh))
        img = img + rng.normal(0, 2.0, img.shape)
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
        boxes.append(frame_boxes)
    if return_boxes:
        return frames, boxes
    return frames


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--clips", type=int, default=12)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 768))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", default="faster_rcnn_R_50_FPN_3x")
    args = ap.parse_args()

    from lmsfc_tpu.registry import VISIONMODELS
    import lmsfc_tpu.plugins  # noqa: F401

    model = VISIONMODELS[args.arch](weights=None, resize_input=False)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    h, w = args.hw

    for ci in range(args.clips):
        frames = motion_clip(rng, args.frames, h, w)
        per_level: dict = {}
        for img in frames:
            feats = model.input_to_features([{"image_bgr": img}])
            for k, v in feats["data"].items():
                per_level.setdefault(k, []).append(np.asarray(v, np.float32)[0])
        arrays = {k: np.stack(v) for k, v in per_level.items()}  # [T,C,H,W]
        np.savez(
            out / f"clip{ci:03d}_clip.npz",
            _meta=json.dumps({"frames": args.frames, "hw": [h, w]}),
            **arrays,
        )
        print(f"{ci+1}/{args.clips} clips dumped", flush=True)
    print(f"done: {args.clips} clips x {args.frames} frames in {out}")


if __name__ == "__main__":
    main()
