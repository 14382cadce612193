#!/bin/bash
# Fix the non-monotone top rate point (VERDICT r3 item 6): single_r4 q4
# (lambda=256) landed PAST the stride-32 transform's ~0.3 bpp saturation
# knee — more bits AND less quality than q3 (RD_r04.json:103-112). Retrain
# the top point FRESH at lambda=96 (inside the knee, per the probe
# calibration in runs/probe_eval.json) with the same 25k-step budget as
# the other singles, then re-run the single-model rd_eval so every BD
# number that touched the old point is recomputed.
#
# The old checkpoint stays at checkpoints/r4_single/q4_lmbda256.0 for the
# record; the new point lives at checkpoints/r4_single/q4_lmbda96.0 (the
# trainer names dirs q{i}_lmbda{l}, so we train it under a scratch root
# and move it into place).
#
# Usage: [STEPS=25000] scripts/r5_q4fix.sh [pidfile-to-wait-on]
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
fi

STEPS=${STEPS:-25000}
COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=5000"

if [ ! -d checkpoints/r4_single/q4_lmbda96.0 ]; then
  echo "=== [1/2] retrain top rate point at lambda=96 ==="
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
    'training.lmbdas=[96.0]' training.steps="$STEPS" \
    training.ckpt_root=checkpoints/r5_q4fix 2>&1 | tee runs/r5_q4fix_train.log
  mv checkpoints/r5_q4fix/q1_lmbda96.0 checkpoints/r4_single/q4_lmbda96.0
fi

echo "=== [2/2] re-eval singles with the recalibrated grid ==="
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single \
  --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 96.0 \
  --frames 16 --out runs/rd_r05_single --report RD_r05_single.json \
  2>&1 | tee runs/r5_q4fix_eval.log
echo "=== Q4FIX DONE ==="
