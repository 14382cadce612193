#!/bin/bash
# Second equal-budget extension of the two r4 joint models: 100k -> 150k.
# At 100k the ChARM+LRP joint closed its 50k deficit (-0.28 dB BD-PSNR)
# to a tie (+0.002 dB) while gaining ~2x faster between checkpoints
# (+0.59 vs +0.35 dB); this tests whether the steeper trajectory turns
# the tie into an outright win at 1.5x the budget — both models extended
# equally so the comparison stays fair.
#
# Resumes from the latest orbax checkpoint in each ckpt_root (run/train.py
# restores and continues when training.steps exceeds the stored step).
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

# wait for any prior TPU job (pid file arg) to finish; kill -0 only probes
if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
fi

LMBDAS='[0.5,4.0,32.0,256.0]'
COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=5000"

echo "=== [1/3] plain gain-unit joint -> 150k ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.steps=150000 \
  training.ckpt_root=checkpoints/r4_joint 2>&1 | tee runs/r4_joint150k_train.log

echo "=== [2/3] ChARM + LRP joint -> 150k ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.num_slices=4 \
  training.lrp=true training.steps=150000 \
  training.ckpt_root=checkpoints/r4_charm 2>&1 | tee runs/r4_charm150k_train.log

echo "=== [3/3] RD eval at 150k ==="
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_joint/joint \
  --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_plain150k --report RD_r04_plain150k.json \
  2>&1 | tee runs/r4_eval_plain150k.log
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_charm/joint \
  --num-slices 4 --lrp --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_charm150k --report RD_r04_charm150k.json \
  2>&1 | tee runs/r4_eval_charm150k.log
echo "=== EXTEND150 DONE ==="
