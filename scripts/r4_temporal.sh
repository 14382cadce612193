#!/bin/bash
# Round-3 temporal chain (VERDICT r2 item 4): motion clip dumps -> 4
# single-rate lmsfc-temporal trainings at the recentered lambda grid
# (stride-32 latent, same as the intra baselines so BD-rate(temporal vs
# intra) is computed on overlapping ranges) -> sequence-level bitrate-mode
# R-D artifact.
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

STEPS=${STEPS:-12000}
CLIPS=${CLIPS:-12}
FRAMES=${FRAMES:-12}
MOTION=${MOTION:-data/motion_features}
COMMON="training.feature_dump_dir=$MOTION training.preload=true
training.temporal=true training.intra_period=6 training.clip_len=12
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=12 training.log_every=500 training.ckpt_every=4000"

if [ ! -d "$MOTION" ]; then
  echo "=== generating motion clip dumps ==="
  python scripts/make_motion_features.py --out "$MOTION" \
    --clips $CLIPS --frames $FRAMES --hw 512 768
fi

echo "=== temporal single-rate trainings ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=${TEMPORAL_LMBDAS:-[0.5,4.0,32.0,256.0]}" training.steps=$STEPS \
  training.ckpt_root=checkpoints/r4_temporal 2>&1 | tee runs/r4_temporal_train.log

echo "=== temporal R-D eval ==="
stdbuf -oL python scripts/rd_eval_temporal.py \
  --temporal-root checkpoints/r4_temporal --intra-root checkpoints/r4_single \
  --intra-period 6 ${TEMPORAL_EVAL_LMBDAS:+--lmbdas $TEMPORAL_EVAL_LMBDAS} \
  2>&1 | tee runs/r4_temporal_eval.log
echo "=== TEMPORAL DONE ==="
