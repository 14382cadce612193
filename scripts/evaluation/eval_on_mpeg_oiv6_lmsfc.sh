#!/usr/bin/env bash
# MPEG-OIV6 (5k stills) x L-MSFC sweep, OpenImages-protocol mAP@0.5.
# Equivalent of scripts/evaluation/mpeg_oiv6/eval_on_*.sh.
#
# Env overrides:
#   LMBDAS_OVERRIDE="0.5 4.0 32.0 256.0"  lambda grid (checkpoint dir names)
#   CODEC_ARGS="codec.settings.latent_stride_div=1"  extra codec settings
#   WITH_BYPASS=1   also run the uncompressed (bypass) upper bound
#   JOINT_CKPT=checkpoints/x/joint  one gain-unit joint for all qps
#       (codec.settings.num_rates=4 + shared checkpoint_dir, qp=1..4;
#       LMBDAS_OVERRIDE then only sets the number of rate legs)
set -euo pipefail
DATA_ROOT=${1:-./data/mpeg-oiv6}
OUT_ROOT=${2:-./runs/oiv6_lmsfc}
CKPT_ROOT=${3:-./checkpoints}
TASK=${4:-detection}   # detection | segmentation
read -r -a LMBDAS <<< "${LMBDAS_OVERRIDE:-0.0125 0.025 0.05 0.1}"
CODEC_ARGS=${CODEC_ARGS:-}
WITH_BYPASS=${WITH_BYPASS:-0}
# annotation file resolved against DATA_ROOT; the committed dummy set uses
# ann.json at the root (r4 chain stage 4 left the example default
# annotations/instances.json in place -> 0-image dataset -> nan sweep)
ANN_FILE=${ANN_FILE:-$([ -f "${DATA_ROOT}/ann.json" ] && echo ann.json || echo annotations/instances.json)}

ARCH=faster_rcnn_R_50_FPN_3x
EVAL=OIC-EVAL
if [ "$TASK" = "segmentation" ]; then
  ARCH=mask_rcnn_R_50_FPN_3x
  EVAL=COCO-EVAL
fi

if [ "$WITH_BYPASS" = "1" ]; then
  python -m lmsfc_tpu.run.eval_split_inference \
    --config cfgs/eval_split_inference_example.yaml \
    vision_model.arch="${ARCH}" \
    dataset.datacatalog=MPEGOIV6 \
    dataset.config.root="${DATA_ROOT}" \
    dataset.config.annotation_file="${ANN_FILE}" \
    pipeline.type=image \
    evaluator.type="${EVAL}" \
    codec.type=bypass \
    ${CODEC_ARGS} \
    pipeline.output_dir="${OUT_ROOT}/bypass" \
    pipeline.codec_output_dir="${OUT_ROOT}/bypass/codec" \
    misc.overwrite_results=true
  # gate: a bypass (uncompressed) leg that scores <= BYPASS_MIN_ACC means
  # the detector/eval wiring is broken — abort before burning the rate legs
  # (r6 chain lost a sweep to a missing resize_input=false this way)
  if [ -n "${BYPASS_MIN_ACC:-}" ]; then
    python - "$OUT_ROOT/bypass/summary.csv" "$BYPASS_MIN_ACC" <<'PYEOF'
import csv, sys
rows = list(csv.DictReader(open(sys.argv[1])))
acc = float(rows[0]["accuracy"])
assert acc > float(sys.argv[2]), (
    f"bypass accuracy {acc} <= {sys.argv[2]}: detector/eval wiring broken; "
    "not running the rate legs")
print(f"bypass gate ok: accuracy {acc} > {sys.argv[2]}")
PYEOF
  fi
fi

for i in "${!LMBDAS[@]}"; do
  q=$((i + 1))
  if [ -n "${JOINT_CKPT:-}" ]; then
    CKPT_SETTINGS="codec.settings.checkpoint_dir=${JOINT_CKPT} codec.settings.num_rates=${#LMBDAS[@]}"
  else
    CKPT_SETTINGS="codec.settings.checkpoint_dir=${CKPT_ROOT}/q${q}_lmbda${LMBDAS[$i]}"
  fi
  python -m lmsfc_tpu.run.eval_split_inference \
    --config cfgs/eval_split_inference_example.yaml \
    vision_model.arch="${ARCH}" \
    dataset.datacatalog=MPEGOIV6 \
    dataset.config.root="${DATA_ROOT}" \
    dataset.config.annotation_file="${ANN_FILE}" \
    pipeline.type=image \
    evaluator.type="${EVAL}" \
    codec.settings.qp="${q}" \
    ${CKPT_SETTINGS} \
    ${CODEC_ARGS} \
    pipeline.output_dir="${OUT_ROOT}/q${q}" \
    pipeline.codec_output_dir="${OUT_ROOT}/q${q}/codec" \
    misc.overwrite_results=true
done

python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" "${OUT_ROOT}"/q*/summary.csv
