#!/bin/bash
# Third equal-budget extension of the two r4 joint models: 150k -> 162.5k.
# Sized to complete naturally inside the round-3 wall-clock budget
# (plain ~8 min at ~25 steps/s, ChARM ~17 min at ~12 steps/s, then two
# ~8 min evals) so no process has to be killed near the relay.
#
# Resumes from the latest orbax checkpoint in each ckpt_root (run/train.py
# restores and continues when training.steps exceeds the stored step).
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

# wait for any prior TPU job (pid file arg) to finish; kill -0 only probes
if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 30; done
fi

LMBDAS='[0.5,4.0,32.0,256.0]'
COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=5000"

echo "=== [1/3] plain gain-unit joint -> 162.5k ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.steps=162500 \
  training.ckpt_root=checkpoints/r4_joint 2>&1 | tee runs/r4_joint162k_train.log

echo "=== [2/3] ChARM + LRP joint -> 162.5k ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.num_slices=4 \
  training.lrp=true training.steps=162500 \
  training.ckpt_root=checkpoints/r4_charm 2>&1 | tee runs/r4_charm162k_train.log

echo "=== [3/3] RD eval at 162.5k ==="
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_joint/joint \
  --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_plain162k --report RD_r04_plain162k.json \
  2>&1 | tee runs/r4_eval_plain162k.log
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_charm/joint \
  --num-slices 4 --lrp --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_charm162k --report RD_r04_charm162k.json \
  2>&1 | tee runs/r4_eval_charm162k.log
echo "=== EXTEND162 DONE ==="
