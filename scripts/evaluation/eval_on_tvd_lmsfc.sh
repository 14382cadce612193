#!/usr/bin/env bash
# TVD tracking x L-MSFC sweep (JDE {36,61,74} split, MOTA vs kbps).
# Equivalent of scripts/evaluation/tvd/eval_on_tvd_*.sh.
set -euo pipefail
DATA_ROOT=${1:-./data/TVD}
OUT_ROOT=${2:-./runs/tvd_lmsfc}
CKPT_ROOT=${3:-./checkpoints_jde}
LMBDAS=(0.0125 0.025 0.05 0.1)

for seq in TVD-01 TVD-02 TVD-03; do
  for i in "${!LMBDAS[@]}"; do
    q=$((i + 1))
    python -m lmsfc_tpu.run.eval_split_inference \
      --config cfgs/eval_split_inference_example.yaml \
      vision_model.arch=jde_1088x608 \
      dataset.type=TrackingDataset \
      dataset.datacatalog=MPEGTVDTRACKING \
      dataset.config.root="${DATA_ROOT}/${seq}" \
      dataset.config.annotation_file=gt/gt.txt \
      dataset.config.seqinfo=seqinfo.ini \
      evaluator.type=MOT-EVAL evaluator.criteria=mota \
      codec.settings.eval_encode=bitrate \
      codec.settings.out_channels='[256,512,1024]' \
      codec.settings.qp="${q}" \
      codec.settings.checkpoint_dir="${CKPT_ROOT}/q${q}_lmbda${LMBDAS[$i]}" \
      pipeline.output_dir="${OUT_ROOT}/${seq}/q${q}" \
      pipeline.codec_output_dir="${OUT_ROOT}/${seq}/q${q}/codec" \
      misc.overwrite_results=true
  done
done

python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" \
  "${OUT_ROOT}"/*/q*/summary.csv
