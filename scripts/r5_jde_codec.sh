#!/bin/bash
# Train the JDE-feature codec for the MOT artifact (VERDICT r3 item 3):
# one joint gain-unit model over 4 rate points on the 3-level Darknet
# pyramid (256/512/1024 ch), from dumps made by scripts/make_jde_features.py.
# ~25k steps suffices: the artifact needs a codec whose rate ladder moves
# MOTA, not a SOTA codec.
#
# Usage: [STEPS=25000] scripts/r5_jde_codec.sh [pidfile-to-wait-on]
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
fi

STEPS=${STEPS:-25000}

if [ ! -d data/train_features_jde ]; then
  echo "=== [0/1] dump JDE pyramid training features (fixed-seed NN-Part1) ==="
  stdbuf -oL python scripts/make_jde_features.py \
    --out data/train_features_jde --clips 8 --frames 12 \
    2>&1 | tee runs/jde_feature_dump.log
fi

stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml \
  training.feature_dump_dir=data/train_features_jde training.preload=true \
  'training.channels=[256,512,1024]' 'training.base_hw=[32,48]' \
  training.num_filters=128 training.latent_filters=128 training.hyper_filters=96 \
  'training.lmbdas=[0.5,4.0,32.0,256.0]' training.num_rates=4 \
  training.batch=16 training.steps="$STEPS" \
  training.log_every=500 training.ckpt_every=5000 \
  training.ckpt_root=checkpoints/jde_codec 2>&1 | tee runs/jde_codec_train.log
echo "=== JDE CODEC DONE ==="
