#!/bin/bash
# Second calibration probe: HIGH-RATE latent (latent_stride_div=1, stride-32
# latent — 4x the spatial positions) at the same candidate lambdas. The
# stride-64 probe showed an architectural rate ceiling of ~0.07 bpp
# (lambda=128 -> bpp 0.070); this measures the headroom of the hi-rate
# variant before committing to the full round-3 training grid.
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=4000"

stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=[2.0,16.0,128.0]" training.steps=4000 \
  training.ckpt_root=checkpoints/probe_hr 2>&1 | tee runs/probe_hr_train.log

stdbuf -oL python scripts/probe_eval.py --ckpts \
  checkpoints/probe_hr/q1_lmbda2.0 \
  checkpoints/probe_hr/q2_lmbda16.0 \
  checkpoints/probe_hr/q3_lmbda128.0 \
  --latent-stride-div 1 \
  --frames 4 --out runs/probe_hr_eval.json 2>&1 | tee runs/probe_hr_eval.log
echo "=== PROBE2 DONE ==="
