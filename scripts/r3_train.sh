#!/bin/bash
# Round-3 RD training: joint gain-unit + ChARM model on regenerated feature
# dumps (the r2 dumps were session-local artifacts). Produces checkpoints
# consumed by scripts/rd_eval.py --num-slices 4 for the RD_r03 artifact and
# scripts/export_bench_params.py for the bench asset.
set -e -o pipefail  # pipefail: `| tee` must not mask a training failure
cd "$(dirname "$0")/.."

STEPS=${STEPS:-30000}
FEATURES=${FEATURES:-data/train_features}
LMBDAS='[0.0125,0.025,0.05,0.1]'
COMMON="training.feature_dump_dir=$FEATURES training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.batch=32 training.log_every=250 training.ckpt_every=5000"

if [ ! -d "$FEATURES" ]; then
  echo "=== generating feature dumps ==="
  python scripts/make_training_features.py --out "$FEATURES" --n 96 --hw 512 768
fi

echo "=== joint gain-unit + ChARM run ==="
stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $COMMON \
  "training.lmbdas=$LMBDAS" training.num_rates=4 training.num_slices=4 \
  training.steps=$STEPS \
  training.ckpt_root=checkpoints/r3_charm 2>&1 | tee checkpoints_r3_train.log
echo "=== DONE ==="
echo "next: python scripts/rd_eval.py --ckpt-root checkpoints/r3_charm \\"
echo "        --joint-dir joint --num-slices 4 --out runs/rd_r03 --report RD_r03.json"
