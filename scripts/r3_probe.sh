#!/bin/bash
# Lambda calibration probes for the round-3 rate-range recentering
# (VERDICT.md item 1): short single-rate trainings at candidate high
# lambdas, then real-bitstream eval of each (+ the round-2 hr_plain
# lambda=0.5 8k-step probe) to map lambda -> eval bpp.
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.batch=32 training.log_every=500 training.ckpt_every=4000"

stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=[2.0,16.0,128.0]" training.steps=4000 \
  training.ckpt_root=checkpoints/probe 2>&1 | tee runs/probe_train.log

stdbuf -oL python scripts/probe_eval.py --ckpts \
  checkpoints/hr_plain/q1_lmbda0.5 \
  checkpoints/probe/q1_lmbda2.0 \
  checkpoints/probe/q2_lmbda16.0 \
  checkpoints/probe/q3_lmbda128.0 \
  --frames 4 --out runs/probe_eval.json 2>&1 | tee runs/probe_eval.log
echo "=== PROBE DONE ==="
