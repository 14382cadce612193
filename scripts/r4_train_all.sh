#!/bin/bash
# Round-3 full retrain at the RECENTERED rate range (VERDICT r2 item 1):
# stride-32 latent (latent_stride_div=1), lambda grid [0.5, 4, 32, 256]
# calibrated by the probe runs (runs/probe_eval.json, probe_hr_eval.json —
# the stride-64 architecture saturates at ~0.11 eval bpp; stride-32 lifts
# the ceiling ~4x and lands the 4 points inside the anchors' 0.04-0.9 bpp
# band).
#
# Chain (single TPU, sequential):
#   1. 4 single-rate baselines        25k steps each
#   2. plain gain-unit joint          50k steps
#   3. ChARM(4 slices)+LRP joint      50k steps
#   4. rd_eval of everything -> RD_r04.json
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

STEPS_SINGLE=${STEPS_SINGLE:-25000}
STEPS_JOINT=${STEPS_JOINT:-50000}
LMBDAS='[0.5,4.0,32.0,256.0]'
COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=5000"

echo "=== [1/4] single-rate baselines ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.steps=$STEPS_SINGLE \
  training.ckpt_root=checkpoints/r4_single 2>&1 | tee runs/r4_single_train.log

echo "=== [2/4] plain gain-unit joint ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 \
  training.steps=$STEPS_JOINT \
  training.ckpt_root=checkpoints/r4_joint 2>&1 | tee runs/r4_joint_train.log

echo "=== [3/4] ChARM + LRP joint ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.num_slices=4 \
  training.lrp=true training.steps=$STEPS_JOINT \
  training.ckpt_root=checkpoints/r4_charm 2>&1 | tee runs/r4_charm_train.log

echo "=== [4/4] RD eval -> RD_r04.json ==="
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_joint/joint \
  --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_plain --report RD_r04_plain.json \
  2>&1 | tee runs/r4_eval_plain.log
stdbuf -oL python scripts/rd_eval.py \
  --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_charm/joint \
  --num-slices 4 --lrp --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 256.0 \
  --frames 16 --out runs/rd_r04_charm --report RD_r04_charm.json \
  2>&1 | tee runs/r4_eval_charm.log
echo "=== CHAIN DONE ==="
