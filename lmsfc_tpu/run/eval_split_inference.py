"""Split-inference evaluation runner.

Mirrors compressai_vision/run/eval_split_inference.py:74-271: build modules
via factories, run the pipeline, compute avg bpp ((sum bytes * 8) / sum
pixels) or bitrate kbps ((sum bytes * 8 * fps) / (1000 * frames)), select the
per-evaluator criteria (mAP@0.5IOU / AP / mota), tabulate and write
summary.csv + provenance.

CLI:  python -m lmsfc_tpu.run.eval_split_inference --config cfg.yaml [k.path=v ...]
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path
from typing import Dict, List, Optional

from .. import plugins  # noqa: F401  (populate registries)
from ..config import (
    Config,
    create_codec,
    create_dataloader,
    create_evaluator,
    create_pipeline,
    create_vision_model,
    load_config,
)
from ..config.provenance import write_outputs


def _calc_bpp(coded_res: Dict) -> float:
    """(sum bytes * 8) / total pixels (ref :225-229)."""
    total_bytes = sum(coded_res.get("bytes", []))
    pixels = coded_res.get("total_pixels", 0)
    return (total_bytes * 8) / pixels if pixels else float("nan")


def _calc_bitrate(coded_res: Dict) -> float:
    """(sum bytes * 8 * fps) / (1000 * frames) -> kbps (ref :217-222)."""
    total_bytes = sum(coded_res.get("bytes", []))
    frames = coded_res.get("n_frames", 0)
    fps = coded_res.get("fps", 30)
    return (total_bytes * 8 * fps) / (1000 * frames) if frames else float("nan")


_CRITERIA_KEYS = ("mAP@0.5IOU", "AP", "mota")


def _summarize_performance(performance, criteria: str = "") -> Optional[float]:
    """Pick the headline accuracy number (ref _summerize_performance :232-271)."""
    if isinstance(performance, (list, tuple)):  # multi-task pipelines
        performance = performance[0] if performance else {}
    if not performance:
        return None
    if criteria and criteria in performance:
        return performance[criteria]
    for key in _CRITERIA_KEYS:
        if key in performance:
            return performance[key]
    return None


def run(conf: Config) -> Dict:
    device = conf.select("misc.device", "tpu")
    if device == "cpu":
        # must win over the axon sitecustomize platform override
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backends already initialized
    vision_model = create_vision_model(conf.vision_model)
    dataloader = create_dataloader(conf.dataset, device)
    evaluator = create_evaluator(
        conf.evaluator, dataloader.dataset.catalog, dataloader.dataset
    ) if "evaluator" in conf else None
    codec = create_codec(conf.codec, vision_model, dataloader.dataset)
    pipeline = create_pipeline(conf.pipeline, device)

    out_dir = Path(pipeline.output_dir)
    if (out_dir / "summary.csv").exists() and not conf.select("misc.overwrite_results", False):
        raise SystemExit(
            f"{out_dir}/summary.csv exists; set misc.overwrite_results=true to overwrite"
        )
    write_outputs(conf, out_dir)

    # run banner of the composed modules (ref :112-140)
    print(
        f"pipeline={type(pipeline).__name__} codec={type(codec).__name__}"
        f"(qp={codec.qp_value}) model={type(vision_model).__name__} "
        f"dataset={type(dataloader.dataset).__name__}"
        f"[{len(dataloader.dataset)}] evaluator={type(evaluator).__name__ if evaluator else 'VOID'}"
    )
    with pipeline.maybe_profile():
        timing, eval_encode_type, coded_res, performance = pipeline(
            vision_model, codec, dataloader, evaluator
        )

    if eval_encode_type == "bitrate":
        rate_key, rate_val = "bitrate_kbps", _calc_bitrate(coded_res)
    else:
        rate_key, rate_val = "bpp", _calc_bpp(coded_res)

    accuracy = _summarize_performance(
        performance, conf.select("evaluator.criteria", "")
    )
    summary = {
        "codec": conf.select("codec.type", "?"),
        "qp": codec.qp_value,
        rate_key: rate_val,
        "accuracy": accuracy,
        **{f"time_{k}": round(v, 3) for k, v in timing.items()},
    }

    with open(out_dir / "summary.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(summary.keys()))
        w.writeheader()
        w.writerow(summary)

    # per-frame coded sizes (ref encode_details_{qp}.csv, :206-214)
    with open(out_dir / f"encode_details_{codec.qp_value}.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "bytes"])
        for i, b in enumerate(coded_res.get("bytes", [])):
            w.writerow([i, b])

    try:
        from tabulate import tabulate

        print(tabulate([summary], headers="keys"))
    except ImportError:  # pragma: no cover
        print(summary)
    return {"summary": summary, "performance": performance, "coded": coded_res}


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = ap.parse_args(argv)
    conf = load_config(args.config, args.overrides)
    run(conf)


if __name__ == "__main__":
    main()
