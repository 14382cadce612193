"""Produce the round-2 R-D artifacts from the trained checkpoints.

For each trained rate point (4 single-lambda checkpoints + the joint
gain-unit model at qp 1..4) this script codes a HELD-OUT feature sequence
(procedural images -> real NN1, seed disjoint from training) through the
registered lmsfc codec — real bitstreams, real rANS — and records
bpp vs feature-PSNR/MSE. Outputs:

  runs/rd_r02/summary.csv    4-qp x {single, joint} rate points
  RD_r02.json                machine-readable curves + BD-rate(joint vs
                             single) computed by tools/bdrate.py

Usage: python scripts/rd_eval.py [--ckpt-root checkpoints] [--frames 8]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LMBDAS = (0.0125, 0.025, 0.05, 0.1)


def build_eval_features(n_frames: int, hw=(256, 384), seed: int = 777):
    """Held-out sequence: procedural images (disjoint seed) -> NN1."""
    from make_training_features import procedural_image  # scripts/ sibling

    from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN

    wrapper = FasterRCNNFPN(resize_input=False)
    rng = np.random.default_rng(seed)
    frames = {k: [] for k in ("p2", "p3", "p4", "p5")}
    for _ in range(n_frames):
        img = procedural_image(rng, *hw)
        out = wrapper.input_to_features([{"image_bgr": img}])
        for k, v in out["data"].items():
            frames[k].append(np.asarray(v, np.float32))
    return {k: np.concatenate(v) for k, v in frames.items()}, hw


def eval_point(codec, data, n_pixels, out_dir: Path, tag: str):
    t0 = time.perf_counter()
    enc = codec.encode({"data": data}, str(out_dir), f"{tag}")
    enc_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    dec = codec.decode(enc["bitstream"], str(out_dir))
    dec_t = time.perf_counter() - t0
    n_frames = next(iter(data.values())).shape[0]
    bpp = sum(enc["bytes"]) * 8 / (n_pixels * n_frames)
    sq_sum, count = 0.0, 0
    peak = 0.0
    for k in data:
        diff = np.asarray(dec["data"][k], np.float32) - data[k]
        sq_sum += float(np.sum(diff**2))
        count += diff.size
        peak = max(peak, float(np.ptp(data[k])))
    mse = sq_sum / count
    psnr = 10 * np.log10(peak**2 / mse) if mse > 0 else float("inf")
    return {
        "bpp": bpp, "mse": mse, "feature_psnr_db": psnr,
        "enc_s": enc_t, "dec_s": dec_t, "n_frames": n_frames,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-root", default="checkpoints")
    ap.add_argument("--single-dir", default="r2_single",
                    help="per-lambda checkpoint dirs under ckpt-root "
                         "(expects <single-dir>/q{i}_lmbda{l})")
    ap.add_argument("--joint-dir", default="r2_joint/joint",
                    help="gain-unit joint checkpoint under ckpt-root")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 384))
    ap.add_argument("--out", default="runs/rd_r02")
    ap.add_argument("--report", default="RD_r02.json",
                    help="summary json path (e.g. RD_r03.json for round 3)")
    ap.add_argument("--num-slices", type=int, default=0,
                    help="ChARM slices of the JOINT checkpoint (the single-"
                         "lambda baselines are plain hyperprior models)")
    ap.add_argument("--latent-stride-div", type=int, default=2,
                    help="FENet final-stage stride (1 = high-rate stride-32 "
                         "latent; must match training)")
    ap.add_argument("--lrp", action="store_true",
                    help="JOINT checkpoint has ChARM LRP nets")
    ap.add_argument("--lmbdas", type=float, nargs="+", default=None,
                    help="lambda grid (defaults to the module LMBDAS)")
    args = ap.parse_args()

    from lmsfc_tpu.codecs.learned import LMSFCCodec
    from lmsfc_tpu.tools.bdrate import bd_rate

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    data, (h, w) = build_eval_features(args.frames, hw=tuple(args.hw))
    n_pixels = h * w
    print(f"eval features: {args.frames} frames at {h}x{w}, "
          f"range [{min(v.min() for v in data.values()):.2f}, "
          f"{max(v.max() for v in data.values()):.2f}]", flush=True)

    rows, curves = [], {"single": [], "joint": []}
    common = dict(num_filters=192, latent_filters=192, hyper_filters=128,
                  dtype="bfloat16", chunk_frames=8,
                  latent_stride_div=args.latent_stride_div)
    lmbdas = tuple(args.lmbdas) if args.lmbdas else LMBDAS
    root = Path(args.ckpt_root)

    for qi, lam in enumerate(lmbdas, start=1):
        ckpt = root / args.single_dir / f"q{qi}_lmbda{lam}"
        if not ckpt.exists():
            print(f"skip single q{qi}: {ckpt} missing")
            continue
        codec = LMSFCCodec(qp=qi, checkpoint_dir=str(ckpt), **common)
        m = eval_point(codec, data, n_pixels, out_dir, f"single_q{qi}")
        rows.append({"model": "single", "qp": qi, "lambda": lam, **m})
        curves["single"].append((m["bpp"], m["feature_psnr_db"]))
        print(f"single q{qi}: bpp={m['bpp']:.4f} psnr={m['feature_psnr_db']:.2f}dB",
              flush=True)

    joint_ckpt = root / args.joint_dir
    if joint_ckpt.exists():
        for qi in range(1, len(lmbdas) + 1):
            codec = LMSFCCodec(qp=qi, checkpoint_dir=str(joint_ckpt),
                               num_rates=len(lmbdas),
                               num_slices=args.num_slices, lrp=args.lrp,
                               **common)
            m = eval_point(codec, data, n_pixels, out_dir, f"joint_q{qi}")
            rows.append({"model": "joint", "qp": qi, "lambda": lmbdas[qi - 1], **m})
            curves["joint"].append((m["bpp"], m["feature_psnr_db"]))
            print(f"joint  q{qi}: bpp={m['bpp']:.4f} psnr={m['feature_psnr_db']:.2f}dB",
                  flush=True)

    if not rows:
        raise SystemExit(
            f"no checkpoints found under {root} "
            f"(looked for {args.single_dir}/q*_lmbda* and {args.joint_dir})"
        )
    with open(out_dir / "summary.csv", "w", newline="") as f:
        wcsv = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        wcsv.writeheader()
        wcsv.writerows(rows)

    report = {"curves": curves, "rows": rows,
              "eval": {"frames": args.frames, "hw": [h, w]}}
    if len(curves["single"]) >= 4 and len(curves["joint"]) >= 4:
        rs, qs = zip(*sorted(curves["single"]))
        rj, qj = zip(*sorted(curves["joint"]))
        try:
            report["bd_rate_joint_vs_single_pct"] = bd_rate(rs, qs, rj, qj)
            print(f"BD-rate joint vs single: "
                  f"{report['bd_rate_joint_vs_single_pct']:+.2f}%")
        except ValueError as e:  # disjoint quality ranges (undertrained joint)
            report["bd_rate_joint_vs_single_pct"] = None
            report["bd_rate_error"] = str(e)
            print(f"BD-rate undefined: {e}")
        mono = all(np.diff([c[1] for c in sorted(curves["single"])]) > 0)
        report["single_curve_monotone"] = bool(mono)
    Path(args.report).write_text(json.dumps(report, indent=2))
    print(f"wrote {out_dir/'summary.csv'} and {args.report}")


if __name__ == "__main__":
    main()
