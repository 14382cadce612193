"""Temporal-codec R-D artifact (VERDICT r2 item 4).

Codes a HELD-OUT synthetic-motion sequence (disjoint seed, through the
real NN1 — same protocol as scripts/make_motion_features.py) with:
  * the trained lmsfc-temporal checkpoints (conditional GOP coding), and
  * the trained intra lmsfc singles (the r4 stride-32 baselines)
at 4 rate points each, in BITRATE mode (kbps at the TVD 30 fps
convention; bpp also reported). Real bitstreams, real rANS. Outputs:

  runs/rd_temporal/summary.csv
  RD_r04_temporal.json  — curves, BD-rate(temporal vs intra), and the
                          per-frame intra-vs-inter byte split (the
                          trained predictor's measured bit savings)

Ref: video workload semantics compressai_vision/pipelines/split_inference/
video_split_inference.py:86-249; bitrate rule run/eval_split_inference.py:
217-222.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from make_motion_features import motion_clip  # scripts/ sibling

FPS = 30.0  # TVD convention


def build_eval_sequence(n_frames: int, hw=(256, 384), seed: int = 90210):
    from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN

    wrapper = FasterRCNNFPN(resize_input=False)
    rng = np.random.default_rng(seed)
    frames = motion_clip(rng, n_frames, *hw)
    per_level: dict = {}
    for img in frames:
        out = wrapper.input_to_features([{"image_bgr": img}])
        for k, v in out["data"].items():
            per_level.setdefault(k, []).append(np.asarray(v, np.float32)[0])
    return {k: np.stack(v) for k, v in per_level.items()}, hw


def eval_point(codec, data, n_pixels, out_dir: Path, tag: str):
    # no timing columns (VERDICT r3 weak #6): single-shot wall time on the
    # shared box is noise; throughput belongs to bench.py
    enc = codec.encode({"data": data}, str(out_dir), tag)
    mode_flags = enc.get("mode_flags")
    dec = codec.decode(enc["bitstream"], str(out_dir))
    n_frames = next(iter(data.values())).shape[0]
    total_bits = sum(enc["bytes"]) * 8
    sq_sum, count, peak = 0.0, 0, 0.0
    for k in data:
        diff = np.asarray(dec["data"][k], np.float32) - data[k]
        sq_sum += float(np.sum(diff**2))
        count += diff.size
        peak = max(peak, float(np.ptp(data[k])))
    mse = sq_sum / count
    return {
        "bpp": total_bits / (n_pixels * n_frames),
        "kbps": total_bits * FPS / (1000.0 * n_frames),
        "mse": mse,
        "feature_psnr_db": 10 * np.log10(peak**2 / mse) if mse > 0 else float("inf"),
        "n_frames": n_frames,
        "per_frame_bytes": [float(b) for b in enc["bytes"]],
        **({"mode_flags": mode_flags} if mode_flags is not None else {}),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--temporal-root", default="checkpoints/r4_temporal")
    ap.add_argument("--intra-root", default="checkpoints/r4_single")
    ap.add_argument("--lmbdas", type=float, nargs="+",
                    default=[0.5, 4.0, 32.0, 256.0])
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 384))
    ap.add_argument("--intra-period", type=int, default=8)
    ap.add_argument("--latent-stride-div", type=int, default=1)
    ap.add_argument("--out", default="runs/rd_temporal")
    ap.add_argument("--report", default="RD_r04_temporal.json")
    args = ap.parse_args()

    from lmsfc_tpu.codecs.learned import LMSFCCodec
    from lmsfc_tpu.codecs.learned_temporal import LMSFCTemporalCodec
    from lmsfc_tpu.tools.bdrate import bd_rate

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    data, (h, w) = build_eval_sequence(args.frames, hw=tuple(args.hw))
    n_pixels = h * w
    print(f"eval motion sequence: {args.frames} frames at {h}x{w}", flush=True)

    common = dict(num_filters=192, latent_filters=192, hyper_filters=128,
                  dtype="bfloat16", latent_stride_div=args.latent_stride_div)
    rows, curves = [], {"intra": [], "temporal": []}
    savings = []
    for qi, lam in enumerate(args.lmbdas, start=1):
        ic = Path(args.intra_root) / f"q{qi}_lmbda{lam}"
        if ic.exists():
            codec = LMSFCCodec(checkpoint_dir=str(ic), chunk_frames=8, **common)
            m = eval_point(codec, data, n_pixels, out_dir, f"intra_q{qi}")
            m.pop("per_frame_bytes")
            rows.append({"model": "intra", "qp": qi, "lambda": lam, **m})
            curves["intra"].append((m["bpp"], m["feature_psnr_db"]))
            print(f"intra    q{qi}: bpp={m['bpp']:.4f} kbps={m['kbps']:.1f} "
                  f"psnr={m['feature_psnr_db']:.2f}dB", flush=True)
        tc = Path(args.temporal_root) / f"q{qi}_lmbda{lam}"
        if tc.exists():
            codec = LMSFCTemporalCodec(
                checkpoint_dir=str(tc), intra_period=args.intra_period, **common)
            m = eval_point(codec, data, n_pixels, out_dir, f"temporal_q{qi}")
            pf = m.pop("per_frame_bytes")
            mf = m.pop("mode_flags", None)
            ip = args.intra_period
            intra_b = [b for i, b in enumerate(pf) if i % ip == 0]
            inter_b = [b for i, b in enumerate(pf) if i % ip != 0]
            sav = {"qp": qi,
                   "intra_frame_bytes": float(np.mean(intra_b)),
                   "inter_frame_bytes": float(np.mean(inter_b)),
                   "predictor_savings_pct": 100.0 * (1 - np.mean(inter_b) / np.mean(intra_b))}
            if mf is not None:
                # v4 mode decision: how many non-key frames actually chose
                # the conditional (predictor) mode over hyper-only intra
                inter_modes = [mf[i] for i in range(len(pf)) if i % ip != 0]
                sav["inter_conditional_frames"] = int(np.sum(inter_modes))
                sav["inter_total_frames"] = len(inter_modes)
            savings.append(sav)
            rows.append({"model": "temporal", "qp": qi, "lambda": lam, **m})
            curves["temporal"].append((m["bpp"], m["feature_psnr_db"]))
            print(f"temporal q{qi}: bpp={m['bpp']:.4f} kbps={m['kbps']:.1f} "
                  f"psnr={m['feature_psnr_db']:.2f}dB "
                  f"(inter frames {sav['predictor_savings_pct']:.1f}% smaller)",
                  flush=True)

    if not rows:
        raise SystemExit("no checkpoints found")
    with open(out_dir / "summary.csv", "w", newline="") as f:
        wcsv = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        wcsv.writeheader()
        wcsv.writerows(rows)
    report = {"curves": curves, "rows": rows, "predictor_savings": savings,
              "eval": {"frames": args.frames, "hw": [h, w], "fps": FPS,
                       "intra_period": args.intra_period}}
    if len(curves["intra"]) >= 4 and len(curves["temporal"]) >= 4:
        ri, qi_ = zip(*sorted(curves["intra"]))
        rt, qt = zip(*sorted(curves["temporal"]))
        try:
            report["bd_rate_temporal_vs_intra_pct"] = bd_rate(ri, qi_, rt, qt)
            print(f"BD-rate temporal vs intra: "
                  f"{report['bd_rate_temporal_vs_intra_pct']:+.2f}%")
        except ValueError as e:
            report["bd_rate_temporal_vs_intra_pct"] = None
            report["bd_rate_error"] = str(e)
    Path(args.report).write_text(json.dumps(report, indent=2))
    print(f"wrote {out_dir/'summary.csv'} and {args.report}")


if __name__ == "__main__":
    main()
