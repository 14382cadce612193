"""Codec-reconstructed FPN pyramids of the dummy-OIV6 images, per rate.

Ingredient for the task-aware OIV6 detector (VERDICT r4 next #1): the r4
sweep's coded legs sat at noise level because (diagnosed by
scripts/diag_oiv6.py) the codec's structured reconstruction error breaks
the overfit NN-Part2's decision margins — same failure mode as the MOT
head, same fix (the reference's NN2 likewise consumes FCM-coded features
at eval time through its split-inference decode leg,
ref compressai_vision/pipelines/split_inference/image_split_inference.py).

Runs the REAL registered codec (bitstream on disk + rANS), so the training
conditions follow the same codec path the sweep's decode leg feeds NN2
(stored f16; the sweep decodes to f32).

Usage:
  JAX_PLATFORMS=cpu python scripts/make_oiv6_codec_recons.py \
      [--data data/dummy_oiv6] [--ckpt checkpoints/oiv6_knee/joint] \
      [--out data/dummy_oiv6/_feat_recons.npz]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

KEYS = ("p2", "p3", "p4", "p5")


def ckpt_fingerprint(ckpt_dir: str) -> str:
    """Stable hash of the checkpoint content (ADVICE r4: recons must be
    invalidated when the codec is retrained, not gated on bare file
    existence)."""
    h = hashlib.sha256()
    root = Path(ckpt_dir)
    for p in sorted(root.rglob("*")):
        if p.is_file():
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
    return h.hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="data/dummy_oiv6")
    ap.add_argument("--ckpt", default="checkpoints/oiv6_knee/joint")
    ap.add_argument("--out", default="data/dummy_oiv6/_feat_recons.npz")
    ap.add_argument("--qps", type=int, nargs="+", default=[1, 2, 3, 4])
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
    wrapper = FasterRCNNFPN(resize_input=False)

    pyrs = []
    for im in ann["images"]:
        img = cv2.imread(str(root / "images" / im["file_name"]))
        out = wrapper.input_to_features(
            [{"image_bgr": img,
              "org_input_size": {"height": im["height"], "width": im["width"]}}]
        )
        pyrs.append({k: np.asarray(out["data"][k], np.float32) for k in KEYS})
    data = {k: np.concatenate([p[k] for p in pyrs]) for k in KEYS}  # [6,C,H,W]
    npix = sum(im["height"] * im["width"] for im in ann["images"])

    out_arrays = {}
    for q in args.qps:
        codec = LMSFCCodec(
            qp=q, checkpoint_dir=args.ckpt, num_rates=4,
            num_filters=192, latent_filters=192, hyper_filters=128,
            latent_stride_div=1, dtype="float32", seed=0,
        )
        t0 = time.time()
        n_bytes = 0
        with tempfile.TemporaryDirectory() as td:
            data_dev = {k: jnp.asarray(v) for k, v in data.items()}
            enc = codec.encode({"data": data_dev}, td, f"recon_q{q}")
            dec = codec.decode(enc["bitstream"], td)
            n_bytes = sum(enc["bytes"])
        mse = cnt = 0
        for k in KEYS:
            rec = np.asarray(dec["data"][k], np.float32)
            mse += float(np.sum((rec - data[k]) ** 2))
            cnt += rec.size
            # stored NHWC f16 (the trainer's layout); eval decodes f32 —
            # same codec path, small storage quantization
            out_arrays[f"q{q}_{k}"] = np.transpose(
                rec, (0, 2, 3, 1)).astype(np.float16)
        print(f"q{q}: mse={mse/cnt:.5f} bpp={n_bytes*8/npix:.4f} "
              f"({time.time()-t0:.1f}s)", flush=True)

    out_arrays["ckpt_fingerprint"] = np.frombuffer(
        ckpt_fingerprint(args.ckpt).encode(), dtype=np.uint8)
    np.savez(args.out, **out_arrays)
    print(f"wrote {args.out} "
          f"({Path(args.out).stat().st_size / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
