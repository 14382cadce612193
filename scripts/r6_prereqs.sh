#!/bin/bash
# Rebuild the gitignored prerequisites the session reset wiped (checkpoints/
# and data/*_features are not committed; see scripts/params_store.py for the
# durability fix). Everything here is CPU-only and deterministic (seeded
# generators + seeded NN1), pinned to JAX_PLATFORMS=cpu so a wedged relay is
# never touched. Each product is skipped when already present, so this is
# safe to re-run and safe for the TPU chain to call as its stage 0.
#
# Usage: scripts/r6_prereqs.sh
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

if [ ! -d data/train_features ]; then
  echo "=== train_features (FPN p2..p5 dumps) ==="
  stdbuf -oL python scripts/make_training_features.py \
    --out data/train_features --n 96 --hw 512 768
fi

if [ ! -d data/train_features_jde ]; then
  echo "=== train_features_jde (Darknet 256/512/1024 dumps) ==="
  stdbuf -oL python scripts/make_jde_features.py \
    --out data/train_features_jde --clips 8 --frames 12
fi

if [ ! -d data/motion_features ]; then
  echo "=== motion_features (temporal clip dumps) ==="
  stdbuf -oL python scripts/make_motion_features.py \
    --out data/motion_features --clips 12 --frames 12 --hw 512 768
fi

if [ ! -f checkpoints/oiv6_detector/part2.npz ]; then
  if [ -f artifacts/params/oiv6_part2.npz ]; then
    mkdir -p checkpoints/oiv6_detector
    cp artifacts/params/oiv6_part2.npz checkpoints/oiv6_detector/part2.npz
    echo "=== oiv6 detector restored from committed artifact ==="
  else
    echo "=== overfit-train the dummy-OIV6 NN-Part2 (CPU) ==="
    stdbuf -oL python scripts/train_dummy_oiv6_detector.py \
      --data data/dummy_oiv6 --out checkpoints/oiv6_detector/part2.npz \
      --device cpu 2>&1 | tee runs/oiv6_detector_train.log
    mkdir -p artifacts/params
    cp checkpoints/oiv6_detector/part2.npz artifacts/params/oiv6_part2.npz
  fi
fi

if [ ! -f checkpoints/jde_head/head.npz ]; then
  if [ -f artifacts/params/jde_head.npz ]; then
    mkdir -p checkpoints/jde_head
    cp artifacts/params/jde_head.npz checkpoints/jde_head/head.npz
    echo "=== jde head restored from committed artifact ==="
  else
    echo "=== distill-train the dummy-TVD JDE head (CPU) ==="
    stdbuf -oL python scripts/train_dummy_jde_head.py \
      --data data/dummy_tvd --out checkpoints/jde_head/head.npz \
      --device cpu 2>&1 | tee runs/jde_head_train.log
    mkdir -p artifacts/params
    cp checkpoints/jde_head/head.npz artifacts/params/jde_head.npz
  fi
fi

echo "=== PREREQS DONE ==="
