#!/usr/bin/env bash
# Close the MOT accuracy-rate gradient gap (VERDICT r4 next #2).
#
# Both fixes from the r4 diagnosis (commit dfd8a69), together:
#   1. WIDER lambda grid: the 100k codec's [0.5..256] ladder spans only
#      590-867 kbps and every point's residual error exceeds the clean-
#      trained head's decision margins. The wide joint [0.05,1,32,1024]
#      pushes the top rate toward transparency and the bottom rate into
#      visible degradation.
#   2. TASK-AWARE head: fine-tune the supervised JDE head across
#      {clean, q1..q4 recon} conditions so its margins track the ladder
#      (the reference's NN2 likewise consumes decoded FCM features via the
#      split-inference decode path, ref compressai_vision/pipelines/
#      split_inference/video_split_inference.py).
#
# Protocol unchanged (proven in r4: bypass reproduces gt exactly, MOTA
# 100.0 on both sequences): gt = robust head's output on clean features,
# rate legs measure codec-induced degradation only.
#
# Target (VERDICT): MOTA rising with kbps, >=80% of bypass at the top rate,
# both sequences -> runs/mot_r6/cttc.csv.
#
# Usage: [DEVICE=tpu] [CODEC_STEPS=100000] [HEAD_STEPS=600]
#        [DEADLINE_EPOCH=0] scripts/r6_mot_fix.sh
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
DEVICE=${DEVICE:-tpu}
CODEC_STEPS=${CODEC_STEPS:-100000}
HEAD_STEPS=${HEAD_STEPS:-600}
CONF=${CONF:-0.9}
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}
OUT_ROOT=${OUT_ROOT:-runs/mot_r6}
CKPT=checkpoints/jde_codec_wide/joint
HEAD=checkpoints/jde_head/head_wide_robust.npz
WIDE_LMBDAS=${WIDE_LMBDAS:-'[0.05,1.0,32.0,1024.0]'}

scripts/r6_prereqs.sh

# --- 1. wide-ladder JDE joint codec ---
if [ ! -d "$CKPT" ]; then
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml \
    training.feature_dump_dir=data/train_features_jde training.preload=true \
    'training.channels=[256,512,1024]' 'training.base_hw=[32,48]' \
    training.num_filters=128 training.latent_filters=128 \
    training.hyper_filters=96 \
    "training.lmbdas=${WIDE_LMBDAS}" training.num_rates=4 \
    training.aux_learning_rate=5.0e-3 \
    training.batch=16 training.steps="$CODEC_STEPS" \
    training.log_every=2000 training.ckpt_every=25000 \
    training.ckpt_root=checkpoints/jde_codec_wide \
    2>&1 | tee runs/jde_codec_wide_train.log
  python scripts/params_store.py export "$CKPT" \
    artifacts/params/jde_codec_joint_wide.npz
fi

# --- 2. clean feature cache + codec recons (freshness = ckpt fingerprint) ---
if [ ! -f data/dummy_tvd/_feat_cache.npz ]; then
  stdbuf -oL python scripts/train_jde_head_sup.py --cache-only --device cpu
fi
if ! python scripts/check_recons_fresh.py \
    data/dummy_tvd/_feat_recons.npz "$CKPT"; then
  stdbuf -oL python scripts/make_jde_codec_recons.py --ckpt "$CKPT" \
    --out data/dummy_tvd/_feat_recons.npz 2>&1 | tee runs/jde_recons_wide.log
fi

# --- 3. task-aware head: supervised base -> fine-tune across conditions ---
if [ ! -f "$HEAD" ]; then
  stdbuf -oL python scripts/train_jde_head_sup.py \
    --init checkpoints/jde_head/head.npz --out "$HEAD" \
    --recons data/dummy_tvd/_feat_recons.npz \
    --steps "$HEAD_STEPS" --device cpu \
    2>&1 | tee runs/jde_head_wide_robust_train.log
  cp "$HEAD" artifacts/params/jde_head_wide_robust.npz
fi

# --- 4. relabel gt with the robust head on CLEAN features ---
rm -f data/dummy_tvd/DTVD-*/gt/gt.txt
stdbuf -oL python scripts/make_dummy_tvd.py --out data/dummy_tvd \
  --head "$HEAD" --device "$DEVICE" \
  --conf-thres "$CONF" 2>&1 | tee runs/mot_label_r6.log
for seq in data/dummy_tvd/DTVD-*/; do
  test -s "${seq}gt/gt.txt" || { echo "no gt for ${seq}"; exit 1; }
  wc -l "${seq}gt/gt.txt"
done

# COMMON as a bash array: unquoted scalar expansion made the splits=[...]
# override a live glob and broke under set -u edge cases (ADVICE r4)
COMMON=(
  vision_model.arch=jde_1088x608
  'vision_model.jde_1088x608.splits=[36,61,74]'
  "vision_model.jde_1088x608.weights=${HEAD}"
  "vision_model.jde_1088x608.conf_thres=${CONF}"
  dataset.type=TrackingDataset
  dataset.datacatalog=MPEGTVDTRACKING
  dataset.settings.width=576 dataset.settings.height=320
  dataset.config.annotation_file=gt/gt.txt
  dataset.config.seqinfo=seqinfo.ini
  pipeline.type=video
  evaluator.type=MOT-EVAL evaluator.criteria=mota
  misc.overwrite_results=true
  "misc.device=${DEVICE}"
)

rm -rf "$OUT_ROOT"
for seq in data/dummy_tvd/DTVD-*/; do
  name=$(basename "${seq}")
  python -m lmsfc_tpu.run.eval_split_inference \
    --config cfgs/eval_split_inference_example.yaml \
    "${COMMON[@]}" \
    dataset.config.root="${seq%/}" \
    codec.type=bypass \
    pipeline.output_dir="${OUT_ROOT}/${name}/bypass" \
    pipeline.codec_output_dir="${OUT_ROOT}/${name}/bypass/codec"
done

for seq in data/dummy_tvd/DTVD-*/; do
  name=$(basename "${seq}")
  for q in 1 4 2 3; do
    if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
      echo "=== deadline reached; skipping remaining legs ==="
      break 2
    fi
    python -m lmsfc_tpu.run.eval_split_inference \
      --config cfgs/eval_split_inference_example.yaml \
      "${COMMON[@]}" \
      dataset.config.root="${seq%/}" \
      codec.settings.eval_encode=bitrate \
      codec.settings.out_channels='[256,512,1024]' \
      codec.settings.num_rates=4 \
      codec.settings.num_filters=128 \
      codec.settings.latent_filters=128 \
      codec.settings.hyper_filters=96 \
      codec.settings.qp="${q}" \
      codec.settings.checkpoint_dir="$CKPT" \
      pipeline.output_dir="${OUT_ROOT}/${name}/q${q}" \
      pipeline.codec_output_dir="${OUT_ROOT}/${name}/q${q}/codec"
  done
done

# aggregate whatever exists (nullglob so a deadline-truncated sweep still
# aggregates the bypass rows instead of dying on an unmatched glob)
shopt -s nullglob
summaries=("${OUT_ROOT}"/*/q*/summary.csv "${OUT_ROOT}"/*/bypass/summary.csv)
[ ${#summaries[@]} -gt 0 ] || { echo "no summaries produced"; exit 1; }
python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" "${summaries[@]}"
cat "${OUT_ROOT}/cttc.csv"
echo "=== MOT R6 DONE ==="
