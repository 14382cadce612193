#!/usr/bin/env bash
# Task-aware MOT artifact (the r4 diagnosis' prescribed fix, commit dfd8a69):
# the protocol is proven (bypass MOTA 100.0 on both sequences) but MOTA was
# flat at -20..-34 across the 100k codec's 590-867 kbps ladder — every rate
# point's residual error exceeded the CLEAN-trained head's decision margins.
# Fix #2 from that diagnosis: fine-tune the head ON codec-compressed features
# so its margins track the ladder (the reference's NN2 likewise consumes
# decoded FCM features through the split-inference decode path, ref
# compressai_vision/pipelines/split_inference/video_split_inference.py —
# a deployed split-inference head sees coded features, never clean ones).
#
# Like every dummy-set artifact in this repo the head is overfit-by-design
# on the committed 2-sequence set (the VERDICT-sanctioned regime for an
# egress-less environment); what the artifact demonstrates is the CONTRACT —
# accuracy responds monotonically to rate — not generalization.
#
# Pipeline (all CPU-safe; DEVICE=tpu accelerates labeling + sweep):
#   1. prereqs (committed head + features rebuilt from durable artifacts)
#   2. 100k JDE codec checkpoint from durable params
#   3. clean feature cache -> real-bitstream codec recons at q1..q4
#   4. head fine-tune across {clean, q1..q4} conditions
#   5. relabel gt with the robust head (clean features, conf 0.9)
#   6. bypass + 4-rate sweep -> runs/mot_r5_robust/cttc.csv
#
# Usage: [DEVICE=cpu] [STEPS=300] [DEADLINE_EPOCH=0] scripts/r5_mot_robust.sh
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
DEVICE=${DEVICE:-cpu}
[ "$DEVICE" = cpu ] && export JAX_PLATFORMS=cpu
STEPS=${STEPS:-300}
CONF=${CONF:-0.9}
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}
OUT_ROOT=runs/mot_r5_robust   # runs/mot_r6 belongs to scripts/r6_mot_fix.sh
HEAD=checkpoints/jde_head/head_robust.npz

scripts/r6_prereqs.sh

if [ ! -d checkpoints/jde_codec_100k/joint ]; then
  python scripts/params_store.py import \
    artifacts/params/jde_codec_joint_100k.npz checkpoints/jde_codec_100k/joint
fi

if [ ! -f data/dummy_tvd/_feat_cache.npz ]; then
  stdbuf -oL python scripts/train_jde_head_sup.py --cache-only --device cpu
fi

# freshness tied to the codec checkpoint content (ADVICE r4: bare existence
# gating let stale recons survive a codec retrain)
if ! python scripts/check_recons_fresh.py \
    data/dummy_tvd/_feat_recons.npz checkpoints/jde_codec_100k/joint; then
  stdbuf -oL python scripts/make_jde_codec_recons.py \
    2>&1 | tee runs/jde_recons.log
fi

if [ ! -f "$HEAD" ]; then
  stdbuf -oL python scripts/train_jde_head_sup.py \
    --init checkpoints/jde_head/head.npz --out "$HEAD" \
    --recons data/dummy_tvd/_feat_recons.npz \
    --steps "$STEPS" --device cpu 2>&1 | tee runs/jde_head_robust_train.log
  cp "$HEAD" artifacts/params/jde_head_robust.npz
fi

# 5. relabel: gt = the robust head's output on CLEAN features, so bypass
# reproduces it exactly (MOTA 100.0 anchors the protocol) and the rate legs
# measure pure codec-induced degradation
rm -f data/dummy_tvd/DTVD-*/gt/gt.txt
stdbuf -oL python scripts/make_dummy_tvd.py --out data/dummy_tvd \
  --head "$HEAD" --device "$DEVICE" \
  --conf-thres "$CONF" 2>&1 | tee runs/mot_label_robust.log
for seq in data/dummy_tvd/DTVD-*/; do
  test -s "${seq}gt/gt.txt" || { echo "no gt for ${seq}"; exit 1; }
  wc -l "${seq}gt/gt.txt"
done

# array + quoted expansion: the unquoted scalar made splits=[...] a live
# glob (ADVICE r4)
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
)

rm -rf "$OUT_ROOT"
for seq in data/dummy_tvd/DTVD-*/; do
  name=$(basename "${seq}")
  python -m lmsfc_tpu.run.eval_split_inference \
    --config cfgs/eval_split_inference_example.yaml \
    "${COMMON[@]}" \
    dataset.config.root="${seq%/}" \
    codec.type=bypass \
    pipeline.dump_features_dir="${OUT_ROOT}/${name}/_featcache" \
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
      codec.settings.checkpoint_dir=checkpoints/jde_codec_100k/joint \
      pipeline.dump_features_dir="${OUT_ROOT}/${name}/_featcache" \
      pipeline.output_dir="${OUT_ROOT}/${name}/q${q}" \
      pipeline.codec_output_dir="${OUT_ROOT}/${name}/q${q}/codec"
  done
done

# nullglob + count guard: a deadline-truncated sweep still aggregates the
# bypass rows instead of dying on an unmatched glob (ADVICE r4)
shopt -s nullglob
summaries=("${OUT_ROOT}"/*/q*/summary.csv "${OUT_ROOT}"/*/bypass/summary.csv)
[ ${#summaries[@]} -gt 0 ] || { echo "no summaries produced"; exit 1; }
python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" "${summaries[@]}"
cat "${OUT_ROOT}/cttc.csv"
echo "=== MOT ROBUST DONE ==="
