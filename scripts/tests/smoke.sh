#!/usr/bin/env bash
# CLI smoke test: fabricate a dummy dataset, run split-inference with the
# bypass codec, check artifacts (equivalent of scripts/tests/runall.bash's
# CLI exercises, SURVEY.md §4 — runnable without checkpoints or codecs).
set -euo pipefail
cd "$(dirname "$0")/../.."
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}

python -m lmsfc_tpu.run.cli info
python -m lmsfc_tpu.run.cli list-plugins
python -m lmsfc_tpu.run.cli dummy --dir "$WORK/ds" --width 96 --height 64

cat > "$WORK/cfg.yaml" <<YAML
misc: {device: cpu, overwrite_results: true}
vision_model:
  arch: faster_rcnn_R_50_FPN_3x
  faster_rcnn_R_50_FPN_3x: {resize_input: false}
dataset:
  type: Detectron2Dataset
  datacatalog: COCO
  config: {root: $WORK/ds, imgs_folder: images, annotation_file: ann.json}
  batch_size: 1
evaluator: {type: COCO-EVAL, criteria: AP}
pipeline:
  type: image
  name: split-inference
  output_dir: $WORK/run
  codec_output_dir: $WORK/run/codec
  conformance: true
codec: {type: bypass, settings: {}}
YAML

python -m lmsfc_tpu.run.cli eval --config "$WORK/cfg.yaml"
test -f "$WORK/run/summary.csv"
ls "$WORK"/run/*_conformance.json >/dev/null
python -m lmsfc_tpu.tools.aggregate cttc "$WORK/cttc.csv" "$WORK/run/summary.csv"
test -f "$WORK/cttc.csv"
echo "smoke ok"
