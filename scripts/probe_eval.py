"""Lambda-grid calibration probe: real-bitstream bpp/PSNR of short-trained
single-rate checkpoints.

VERDICT.md round-2 item 1 asks the rate points to span the anchors'
~0.04-0.9 bpp range (reference csv examples/vcm/interdigital/vtm_scale_100/
vtm-scale-100.csv:3-8). This evals arbitrary `q*_lmbda*` checkpoint dirs on
a small held-out sequence to map lambda -> eval bpp BEFORE committing to
full-length training runs.

Usage:
  python scripts/probe_eval.py --ckpts checkpoints/probe/q1_lmbda2.0 \
      checkpoints/hr_plain/q1_lmbda0.5 [--frames 4] [--out probe_eval.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rd_eval import build_eval_features, eval_point  # scripts/ sibling


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpts", nargs="+", required=True)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 384))
    ap.add_argument("--out", default="probe_eval.json")
    ap.add_argument("--latent-stride-div", type=int, default=2)
    args = ap.parse_args()

    from lmsfc_tpu.codecs.learned import LMSFCCodec

    data, (h, w) = build_eval_features(args.frames, hw=tuple(args.hw))
    n_pixels = h * w
    out_dir = Path("runs/probe")
    out_dir.mkdir(parents=True, exist_ok=True)

    results = []
    for ckpt in args.ckpts:
        p = Path(ckpt)
        if not p.exists():
            print(f"skip {ckpt}: missing")
            continue
        lam = p.name.split("lmbda")[-1] if "lmbda" in p.name else "?"
        codec = LMSFCCodec(
            checkpoint_dir=str(p), num_filters=192, latent_filters=192,
            hyper_filters=128, dtype="bfloat16", chunk_frames=4,
            latent_stride_div=args.latent_stride_div,
        )
        m = eval_point(codec, data, n_pixels, out_dir, f"probe_{p.name}")
        row = {"ckpt": str(p), "lambda": lam, **m}
        results.append(row)
        print(f"lambda={lam}: bpp={m['bpp']:.4f} psnr={m['feature_psnr_db']:.2f}dB",
              flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
