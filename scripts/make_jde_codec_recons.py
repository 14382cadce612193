"""Codec-reconstructed JDE feature pyramids for task-aware head training.

The r4 MOT artifact's diagnosis (runs/mot_r5, commit dfd8a69): the protocol
is proven (bypass MOTA 100.0 on both sequences) but MOTA is flat across the
100k JDE codec's 590-867 kbps ladder because every trained rate point's
residual error already exceeds the supervised detector's decision margins.
This script produces the ingredient for the prescribed fix — train the head
on codec-compressed features so its margins track the ladder (the reference
evaluates exactly this task-aware robustness regime: its NN2 consumes the
decoded FCM features through the split-inference decode path, ref
compressai_vision/pipelines/split_inference/video_split_inference.py
decompress -> features_to_output flow).

Runs the REAL registered codec (bitstreams + rANS), not a straight-through
surrogate: the head trains on the same real-bitstream codec path the MOT
sweep's decode leg feeds it (recons stored f16; the eval decodes f32 — a
small storage quantization, not byte identity).

Usage:
  JAX_PLATFORMS=cpu python scripts/make_jde_codec_recons.py \
      [--cache data/dummy_tvd/_feat_cache.npz] \
      [--ckpt checkpoints/jde_codec_100k/joint] \
      [--out data/dummy_tvd/_feat_recons.npz] [--frames N]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

KEYS = ("l36", "l61", "l74")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cache", default="data/dummy_tvd/_feat_cache.npz")
    ap.add_argument("--ckpt", default="checkpoints/jde_codec_100k/joint")
    ap.add_argument("--out", default="data/dummy_tvd/_feat_recons.npz")
    ap.add_argument("--frames", type=int, default=0, help="limit (0 = all)")
    ap.add_argument("--qps", type=int, nargs="+", default=[1, 2, 3, 4])
    args = ap.parse_args()

    from lmsfc_tpu.codecs.learned import LMSFCCodec

    z = np.load(args.cache)
    # cache stores NHWC (train_jde_head_sup.py); the codec consumes NCHW
    data = {k: np.transpose(z[k], (0, 3, 1, 2)).astype(np.float32) for k in KEYS}
    if args.frames:
        data = {k: v[: args.frames] for k, v in data.items()}
    n = data[KEYS[0]].shape[0]

    out = {}
    stats = {}
    for q in args.qps:
        codec = LMSFCCodec(
            qp=q,
            checkpoint_dir=args.ckpt,
            num_rates=4,
            out_channels=[256, 512, 1024],
            num_filters=128,
            latent_filters=128,
            hyper_filters=96,
            dtype="bfloat16",
            chunk_frames=8,
        )
        t0 = time.time()
        with tempfile.TemporaryDirectory() as td:
            enc = codec.encode({"data": data}, td, f"recon_q{q}")
            dec = codec.decode(enc["bitstream"], td)
        dt = time.time() - t0
        mse, cnt = 0.0, 0
        for k in KEYS:
            rec = np.asarray(dec["data"][k], np.float32)
            diff = rec - data[k]
            mse += float(np.sum(diff**2))
            cnt += diff.size
            out[f"q{q}_{k}"] = np.transpose(rec, (0, 2, 3, 1)).astype(np.float16)
        kbps = sum(enc["bytes"]) * 8 / n / (1000 / 30)  # 30 fps convention
        stats[q] = (mse / cnt, kbps)
        print(
            f"q{q}: mse={mse / cnt:.5f} kbps={kbps:.1f} "
            f"({n} frames in {dt:.1f}s)",
            flush=True,
        )

    from make_oiv6_codec_recons import ckpt_fingerprint

    out["ckpt_fingerprint"] = np.frombuffer(
        ckpt_fingerprint(args.ckpt).encode(), dtype=np.uint8)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({Path(args.out).stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
