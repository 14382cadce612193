"""Dump JDE split features ({l36,l61,l74}) for codec RD training.

The MOT artifact's codec (VERDICT r3 item 3) codes the 3-level Darknet
pyramid (256/512/1024 channels), not the FPN's 4x256 — it needs its own
training dumps. Frames come from the same procedural motion-clip family
the dummy-TVD eval sequences use (disjoint seed), letterboxed exactly as
TrackingDataset does, through the REAL fixed-seed NN-Part1.

Keys are written finest-first (l36 stride 8) — FeatureDumpSource and the
FENet fusion consume level dicts in that order.

Usage:
  python scripts/make_jde_features.py --out data/train_features_jde \
      --clips 8 --frames 12 [--hw 320 576] [--seed 1]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from make_motion_features import motion_clip  # scripts/ sibling


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--hw", type=int, nargs=2, default=(320, 576))
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2

    from lmsfc_tpu.datasets.image import letterbox
    from lmsfc_tpu.models.wrappers.jde import JDE1088x608

    wrapper = JDE1088x608(splits=(36, 61, 74))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    h, w = args.hw

    stats = {"min": np.inf, "max": -np.inf}
    n = 0
    for c in range(args.clips):
        for f, img0 in enumerate(motion_clip(rng, args.frames, h, w)):
            img, _, _ = letterbox(img0, h, w)
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            feats = wrapper.input_to_features(
                [{"image": np.transpose(rgb, (2, 0, 1)),
                  "org_input_size": {"height": h, "width": w}}]
            )
            arrays = {
                k: np.asarray(feats["data"][k], np.float32)
                for k in ("l36", "l61", "l74")
            }
            np.savez(out / f"c{c:02d}f{f:03d}_features.npz", **arrays)
            for a in arrays.values():
                stats["min"] = min(stats["min"], float(a.min()))
                stats["max"] = max(stats["max"], float(a.max()))
            n += 1
        print(f"clip {c + 1}/{args.clips} dumped "
              f"(range [{stats['min']:.3f}, {stats['max']:.3f}])", flush=True)

    (out / "stats.json").write_text(json.dumps(stats, indent=2))
    print(f"done: {n} dumps in {out}")


if __name__ == "__main__":
    main()
