#!/usr/bin/env bash
# OIV6 artifact v2: lift the codec's generalization floor.
#
# Same diagnosis as the MOT v2 fix (scripts/r6_mot_v2.sh): the knee joint
# trains on only 96 FPN dumps and its recon error flattens at ~0.43 MSE
# (runs/oiv6_recons.log: q3 0.459 -> q4 0.437 for 1.8x the bits), so the
# top rate cannot approach bypass accuracy. Fix: 4x the training images,
# retrain the same knee joint, and let the fix script's fingerprint gates
# cascade (recons -> robust detector -> relabel -> sweep).
#
# Usage: [DEVICE=tpu] [N=384] scripts/r6_oiv6_v2.sh
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
DEVICE=${DEVICE:-tpu}
N=${N:-384}

if [ ! -f data/train_features/.v2_n ] || \
   [ "$(cat data/train_features/.v2_n)" != "$N" ]; then
  echo "=== regenerating train_features with $N dumps ==="
  rm -rf data/train_features
  # make_training_features has no --device flag: it runs on the default
  # platform (the TPU when the relay is up), which is what we want here
  stdbuf -oL python scripts/make_training_features.py \
    --out data/train_features --n "$N" --hw 512 768 \
    2>&1 | tee runs/oiv6_features_v2.log
  echo "$N" > data/train_features/.v2_n
fi

# force the downstream products to rebuild on the new data; the robust
# detector must also retrain (its conditions come from the new codec) and
# the relabel gate re-keys on the retrained robust detector's md5
rm -rf checkpoints/oiv6_knee
rm -f checkpoints/oiv6_detector/part2_v2_robust.npz

DEVICE="$DEVICE" scripts/r6_oiv6_fix.sh
