"""Diagnose the OIV6 coded-leg collapse (VERDICT r4 next #1).

Separates the two candidate causes of the noise-level coded mAP
(runs/oiv6_r4/cttc.csv: 0.16-2.9 vs bypass 49.2):
  (a) codec reconstruction error on REAL detector features (OOD codec), vs
  (b) detector decision fragility (overfit NN2 cliffs under small error).

For each q, runs the same path the sweep runs (input_to_features ->
LMSFCCodec encode/decode real bitstream -> features_to_output) and prints:
  * per-level normalized MSE (mse / feature_var) + feature PSNR,
  * detection recovery vs the dataset labels on recon features,
  * recovery on clean features and on clean+gaussian noise at the SAME
    rms as the codec error (isolates error STRUCTURE from error size).

Usage: python scripts/diag_oiv6.py [--device cpu] [--qs 1 2 3 4]
       [--ckpt-root checkpoints/r4_single] [--detector path.npz]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LMBDAS = {1: 0.5, 2: 4.0, 3: 32.0, 4: 96.0}


def iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    ab = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def recovery(preds, gt, gt_cls, thr=0.5):
    hit = np.zeros(len(gt), bool)
    order = np.argsort(-preds["scores"])
    for j in order:
        if preds["scores"][j] < thr:
            break
        ious = iou(preds["boxes"][j][None], gt)[0]
        for g in np.argsort(-ious):
            if ious[g] >= 0.5 and not hit[g] and preds["classes"][j] == gt_cls[g]:
                hit[g] = True
                break
    return int(hit.sum()), len(gt)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="data/dummy_oiv6")
    ap.add_argument("--ckpt-root", default="checkpoints/r4_single")
    ap.add_argument("--detector", default="checkpoints/oiv6_detector/part2.npz")
    ap.add_argument("--qs", type=int, nargs="*", default=[1, 2, 3, 4])
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from lmsfc_tpu.codecs.learned import LMSFCCodec
    from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN

    root = Path(args.data)
    ann = json.load(open(root / "ann.json"))
    by_img = {im["id"]: [] for im in ann["images"]}
    for a in ann["annotations"]:
        by_img[a["image_id"]].append(a)

    wrapper = FasterRCNNFPN(resize_input=False, weights=args.detector)

    samples, gts = [], []
    for im in ann["images"]:
        img = cv2.imread(str(root / "images" / im["file_name"]))
        samples.append({
            "image_bgr": img,
            "org_input_size": {"height": im["height"], "width": im["width"]},
        })
        gt = np.asarray(
            [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2],
              a["bbox"][1] + a["bbox"][3]] for a in by_img[im["id"]]],
            np.float32,
        ).reshape(-1, 4)
        gt_cls = np.asarray(
            [a["category_id"] - 1 for a in by_img[im["id"]]], np.int32)
        gts.append((gt, gt_cls))

    feats = [wrapper.input_to_features([s]) for s in samples]

    def detect(feat_pyrs):
        """feat_pyrs: list per image of {p2..p5: [1,C,H,W]} -> recovery."""
        hits = tot = 0
        for fp, (gt, gt_cls), s in zip(feat_pyrs, gts, samples):
            org = s["org_input_size"]
            preds = wrapper.features_to_output({
                "data": {k: jnp.asarray(v) for k, v in fp.items()},
                "input_size": [(org["height"], org["width"])],
                "org_input_size": org,
            })[0]
            h, t = recovery(preds, gt, gt_cls)
            hits += h
            tot += t
        return hits, tot

    clean = [{k: np.asarray(f["data"][k]) for k in ("p2", "p3", "p4", "p5")}
             for f in feats]
    h, t = detect(clean)
    print(f"clean recovery: {h}/{t} ({100*h/t:.1f}%)", flush=True)

    var = {k: float(np.var(np.concatenate([c[k].ravel() for c in clean])))
           for k in ("p2", "p3", "p4", "p5")}
    print("feature std per level:",
          {k: round(v ** 0.5, 3) for k, v in var.items()}, flush=True)

    for q in args.qs:
        lam = LMBDAS[q]
        ckpt = Path(args.ckpt_root) / f"q{q}_lmbda{lam}"
        if not ckpt.exists():
            print(f"q{q}: missing checkpoint {ckpt}; skipped", flush=True)
            continue
        codec = LMSFCCodec(
            num_filters=192, latent_filters=192, hyper_filters=128,
            latent_stride_div=1, dtype="float32", seed=0,
            checkpoint_dir=str(ckpt), qp=q,
        )
        recons, n_bytes, mses = [], 0, {k: [] for k in var}
        with tempfile.TemporaryDirectory() as td:
            for i, c in enumerate(clean):
                data_dev = {k: jnp.asarray(v) for k, v in c.items()}
                out = codec.encode({"data": data_dev}, td, f"im{i}")
                dec = codec.decode(out["bitstream"], td)
                n_bytes += sum(out["bytes"])
                rec = {k: np.asarray(dec["data"][k], np.float32) for k in c}
                recons.append(rec)
                for k in c:
                    mses[k].append(float(np.mean((rec[k] - c[k]) ** 2)))
        mse_n = {k: np.mean(v) / var[k] for k, v in mses.items()}
        npix = sum(s["org_input_size"]["height"] * s["org_input_size"]["width"]
                   for s in samples)
        bpp = n_bytes * 8 / npix
        h, t = detect(recons)
        print(f"q{q} (lmbda={lam}): bpp={bpp:.4f}  "
              f"norm-mse={{{', '.join(f'{k}:{v:.4f}' for k, v in mse_n.items())}}}  "
              f"recon recovery {h}/{t} ({100*h/t:.1f}%)", flush=True)

        # same-rms gaussian probe: is it the SIZE of the error or its shape?
        rng = np.random.default_rng(0)
        noisy = [
            {k: c[k] + rng.normal(0, (np.mean(mses[k])) ** 0.5, c[k].shape)
                 .astype(np.float32) for k in c}
            for c in clean
        ]
        h2, t2 = detect(noisy)
        print(f"    gaussian@same-rms recovery {h2}/{t2} ({100*h2/t2:.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
