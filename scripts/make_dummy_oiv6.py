"""Build the dummy-OIV6 dataset for the end-to-end north-star artifact
(VERDICT r2 item 6).

Real OIV6 images/annotations and real Detectron2 pickles are not
downloadable here, so the accuracy-vs-bpp machinery is exercised with a
SELF-LABELED protocol (documented honestly in the artifact): procedural
images are labeled by the SAME fixed-seed random-weight R-CNN running
UNCOMPRESSED — its detections become the ground truth. The uncompressed
(bypass) run then scores near-perfect mAP by construction, and each lmsfc
rate point measures how much task accuracy survives feature compression —
a real accuracy-vs-bpp curve through the full pipeline; swapping in the
reference's pinned pickle + real OIV6 is a pure data substitution
(ref run/eval_split_inference.py:143-214, scripts/install.sh:103-121).

Usage:
  python scripts/make_dummy_oiv6.py --out data/dummy_oiv6 --n 6 [--hw 256 384]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from make_training_features import procedural_image  # scripts/ sibling


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 384))
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--score-thr", type=float, default=0.2)
    ap.add_argument("--max-det", type=int, default=12)
    ap.add_argument("--weights", default=None,
                    help="part2 .npz for the labeling pass (after overfit "
                         "training the labels must come from the SAME model "
                         "that will be evaluated, or the bypass bound breaks)")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2

    from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    h, w = args.hw
    wrapper = FasterRCNNFPN(resize_input=False, weights=args.weights)

    images, annotations = [], []
    ann_id = 1
    for i in range(args.n):
        img = procedural_image(rng, h, w)
        name = f"oiv6_{i:03d}.png"
        cv2.imwrite(str(out / "images" / name), img)
        sample = {"image_bgr": img, "org_input_size": {"height": h, "width": w}}
        feats = wrapper.input_to_features([sample])
        preds = wrapper.features_to_output(feats)[0]
        order = np.argsort(-preds["scores"])
        kept = 0
        for j in order:
            if preds["scores"][j] < args.score_thr or kept >= args.max_det:
                break
            x0, y0, x1, y1 = [float(v) for v in preds["boxes"][j]]
            if x1 - x0 < 2 or y1 - y0 < 2:
                continue
            annotations.append({
                "id": ann_id,
                "image_id": i,
                "category_id": int(preds["classes"][j]) + 1,  # COCO 1-based
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "area": (x1 - x0) * (y1 - y0),
                "iscrowd": 0,
            })
            ann_id += 1
            kept += 1
        images.append({"id": i, "file_name": name, "height": h, "width": w})
        print(f"{name}: {kept} self-labels", flush=True)

    categories = [{"id": c + 1, "name": f"class{c}"} for c in range(81)]
    json.dump(
        {"images": images, "annotations": annotations, "categories": categories,
         "info": {"protocol": "self-labeled by fixed-seed random-weight "
                              "R-CNN running uncompressed (see module doc)"}},
        open(out / "ann.json", "w"),
    )
    print(f"done: {args.n} images, {ann_id-1} annotations in {out}")


if __name__ == "__main__":
    main()
