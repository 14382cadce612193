#!/bin/bash
# Third equal-budget extension of the two r4 joint models: 150k -> 200k.
# Launch ONLY if the 150k eval still shows ChARM at/behind a tie — tests
# whether its steeper between-checkpoint trajectory (+0.59 vs +0.35 dB at
# 50k->100k) eventually crosses over. Both models extended equally.
#
# Usage: scripts/r4_extend200k.sh [pidfile-to-wait-on]
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
fi

LMBDAS='[0.5,4.0,32.0,256.0]'
COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=5000"

echo "=== [1/3] plain gain-unit joint -> 200k ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.steps=200000 \
  training.ckpt_root=checkpoints/r4_joint 2>&1 | tee runs/r4_joint200k_train.log

echo "=== [2/3] ChARM + LRP joint -> 200k ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.num_slices=4 \
  training.lrp=true training.steps=200000 \
  training.ckpt_root=checkpoints/r4_charm 2>&1 | tee runs/r4_charm200k_train.log

echo "=== [3/3] RD eval at 200k ==="
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_joint/joint \
  --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_plain200k --report RD_r04_plain200k.json \
  2>&1 | tee runs/r4_eval_plain200k.log
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_charm/joint \
  --num-slices 4 --lrp --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_charm200k --report RD_r04_charm200k.json \
  2>&1 | tee runs/r4_eval_charm200k.log
echo "=== EXTEND200 DONE ==="
