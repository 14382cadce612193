#!/usr/bin/env bash
# Dummy-TVD tracking x L-MSFC sweep: MOTA vs kbps (VERDICT r3 item 3).
# Self-labeled protocol (scripts/make_dummy_tvd.py): gt comes from the
# noise-distilled fixed-seed JDE running uncompressed, so the bypass run
# reproduces gt by construction and each rate point measures how much
# tracking quality survives feature compression.
# Ref equivalent: scripts/evaluation/tvd/eval_on_*.sh -> MOT_TVD_EVAL
# (ref evaluators/evaluators.py:324-505).
#
# Env overrides:
#   WITH_BYPASS=1        also run the uncompressed upper bound
#   QPS="1 2 3 4"        rate points (joint gain-unit checkpoint)
#   CODEC_ARGS="..."     extra codec settings
set -euo pipefail
DATA_ROOT=${1:-./data/dummy_tvd}
OUT_ROOT=${2:-./runs/mot_r5}
CKPT=${3:-./checkpoints/jde_codec/joint}
HEAD=${4:-./checkpoints/jde_head/head.npz}
read -r -a QPS <<< "${QPS:-1 2 3 4}"
CODEC_ARGS=${CODEC_ARGS:-}
WITH_BYPASS=${WITH_BYPASS:-0}

COMMON="vision_model.arch=jde_1088x608
vision_model.jde_1088x608.splits=[36,61,74]
vision_model.jde_1088x608.weights=${HEAD}
dataset.type=TrackingDataset
dataset.datacatalog=MPEGTVDTRACKING
dataset.settings.width=576 dataset.settings.height=320
dataset.config.annotation_file=gt/gt.txt
dataset.config.seqinfo=seqinfo.ini
pipeline.type=video
evaluator.type=MOT-EVAL evaluator.criteria=mota
misc.overwrite_results=true"

for seq in "${DATA_ROOT}"/DTVD-*/; do
  name=$(basename "${seq}")
  if [ "$WITH_BYPASS" = "1" ]; then
    python -m lmsfc_tpu.run.eval_split_inference \
      --config cfgs/eval_split_inference_example.yaml \
      ${COMMON} \
      dataset.config.root="${seq%/}" \
      codec.type=bypass \
      ${CODEC_ARGS} \
      pipeline.output_dir="${OUT_ROOT}/${name}/bypass" \
      pipeline.codec_output_dir="${OUT_ROOT}/${name}/bypass/codec"
  fi
  for q in "${QPS[@]}"; do
    python -m lmsfc_tpu.run.eval_split_inference \
      --config cfgs/eval_split_inference_example.yaml \
      ${COMMON} \
      dataset.config.root="${seq%/}" \
      codec.settings.eval_encode=bitrate \
      codec.settings.out_channels='[256,512,1024]' \
      codec.settings.num_rates=4 \
      codec.settings.num_filters=128 \
      codec.settings.latent_filters=128 \
      codec.settings.hyper_filters=96 \
      codec.settings.qp="${q}" \
      codec.settings.checkpoint_dir="${CKPT}" \
      ${CODEC_ARGS} \
      pipeline.output_dir="${OUT_ROOT}/${name}/q${q}" \
      pipeline.codec_output_dir="${OUT_ROOT}/${name}/q${q}/codec"
  done
done

python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" \
  "${OUT_ROOT}"/*/q*/summary.csv "${OUT_ROOT}"/*/bypass/summary.csv
