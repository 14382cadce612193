#!/usr/bin/env bash
# Shared core of the anchor-codec sweep scripts (ref scripts/evaluation/
# */eval_on_*_{vtm,hm}.sh:66-148): one runner invocation per
# (sequence, qp), per-sequence intra-period/frame-rate tables, CTTC csv at
# the end. Callers set: CODEC (vtm|hm), DATASET_TYPE, DATACATALOG, ARCH,
# EVALUATOR, CRITERIA, EVAL_ENCODE, PIPE_TYPE and the SEQS/IP/FR tables.
#
# Environment overrides (CI uses these to substitute stub binaries):
#   ENCODER_EXE DECODER_EXE PARCAT_EXE CFG_FILE QPS SEQ_FILTER
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-./data/${DATACATALOG}}
OUT_ROOT=${OUT_ROOT:-./runs/${DATACATALOG,,}_${CODEC}}
QPS=${QPS:-"27 32 37 42 47"}
ENCODER_EXE=${ENCODER_EXE:-EncoderAppStatic}
DECODER_EXE=${DECODER_EXE:-DecoderAppStatic}
PARCAT_EXE=${PARCAT_EXE:-parcatStatic}
CFG_FILE=${CFG_FILE:-}
SEQ_FILTER=${SEQ_FILTER:-}

run_sweep() {
  for seq in "${!SEQS[@]}"; do
    if [[ -n "$SEQ_FILTER" && "$seq" != *"$SEQ_FILTER"* ]]; then continue; fi
    ip=${SEQS[$seq]%%:*}
    fr=${SEQS[$seq]##*:}
    for qp in $QPS; do
      echo "== ${DATACATALOG} ${CODEC} seq=${seq} qp=${qp} ip=${ip} fr=${fr} =="
      python -m lmsfc_tpu.run.eval_split_inference \
        --config cfgs/eval_split_inference_example.yaml \
        pipeline.type="${PIPE_TYPE}" \
        vision_model.arch="${ARCH}" \
        dataset.type="${DATASET_TYPE}" \
        dataset.datacatalog="${DATACATALOG}" \
        dataset.config.root="${DATA_ROOT}/${seq}" \
        dataset.config.annotation_file="${ANNOTATION_FILE:-annotations/${seq}.json}" \
        evaluator.type="${EVALUATOR}" \
        evaluator.criteria="${CRITERIA}" \
        pipeline.output_dir="${OUT_ROOT}/${seq}/qp${qp}" \
        pipeline.codec_output_dir="${OUT_ROOT}/${seq}/qp${qp}/codec" \
        codec.type="${CODEC}" \
        codec.settings.qp="${qp}" \
        codec.settings.intra_period="${ip}" \
        codec.settings.frame_rate="${fr}" \
        codec.settings.parallel_encoding=true \
        codec.settings.encoder_path="${ENCODER_EXE}" \
        codec.settings.decoder_path="${DECODER_EXE}" \
        codec.settings.parcat_path="${PARCAT_EXE}" \
        ${CFG_FILE:+codec.settings.cfg_file="${CFG_FILE}"} \
        codec.settings.eval_encode="${EVAL_ENCODE}" \
        misc.overwrite_results=true \
        ${EXTRA_PARAMS:-}
    done
  done

  python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" \
    "${OUT_ROOT}"/*/qp*/summary.csv
  echo "CTTC written: ${OUT_ROOT}/cttc.csv"
}
