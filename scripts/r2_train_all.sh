#!/bin/bash
# Round-2 production RD training: 4 single-rate points + joint gain-unit
# model at full scale (192 filters) on the real feature dumps.
set -e
cd /root/repo
LMBDAS='[0.0125,0.025,0.05,0.1]'
COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.batch=32 training.log_every=250 training.ckpt_every=5000"

echo "=== single-rate runs ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.steps=25000 \
  training.ckpt_root=checkpoints/r2_single >> checkpoints/single.log 2>&1

echo "=== joint gain-unit run ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.steps=50000 \
  training.ckpt_root=checkpoints/r2_joint >> checkpoints/joint.log 2>&1
echo "=== ALL DONE ==="
