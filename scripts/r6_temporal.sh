#!/usr/bin/env bash
# Make the temporal codec earn its existence (VERDICT r4 next #5).
#
# The r4 failure mode: jointly-trained temporal transforms capped recon
# quality ~1 dB under the intra singles at every rate, so the predictor's
# 51-72% inter-frame bit savings never paid off (RD_r04_temporal.json).
# The fix has two halves, both landed in the v4 codec/trainer:
#   1. FROZEN-BASE GRAFT: each temporal model starts from the matching
#      trained intra single (training.init_base_from) with the base
#      transforms frozen (training.freeze=[base]) — the temporal curve
#      therefore starts EXACTLY on the intra curve and training can only
#      improve the conditional entropy params (rate), never distortion.
#   2. PER-FRAME MODE DECISION (LMFT v4): the encoder codes each non-key
#      frame with whichever entropy params cost fewer bits (conditional
#      vs hyper-only), so a frame the predictor can't help costs at most
#      1 header bit more than intra. Non-domination is structural.
#
# Produces checkpoints/r6_temporal/q{1..4}, runs/rd_temporal_r6,
# RD_r06_temporal.json (BD-rate temporal-vs-intra + mode statistics).
# Ref workload: temporal feature coding on TVD/HiEve (BASELINE.json
# config 4; ref video pipeline video_split_inference.py).
#
# Usage: [STEPS=12000] scripts/r6_temporal.sh
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
STEPS=${STEPS:-12000}
LMBDAS=(0.5 4.0 32.0 96.0)
MOTION=${MOTION:-data/motion_features}
ROOT=checkpoints/r6_temporal

if [ ! -d "$MOTION" ]; then
  echo "=== generating motion clip dumps ==="
  python scripts/make_motion_features.py --out "$MOTION" \
    --clips 12 --frames 12 --hw 512 768
fi

for i in 1 2 3 4; do
  lam=${LMBDAS[$((i - 1))]}
  donor=checkpoints/r4_single/q${i}_lmbda${lam}
  dst=$ROOT/q${i}_lmbda${lam}
  [ -d "$dst" ] && { echo "=== $dst exists, skipping ==="; continue; }
  [ -d "$donor" ] || { echo "missing intra donor $donor"; exit 1; }
  tmp=$ROOT/_tmp_q$i
  rm -rf "$tmp"
  echo "=== temporal q$i (lambda=$lam): predictor-only training on frozen $donor ==="
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc_temporal.yaml \
    training.feature_dump_dir="$MOTION" training.preload=true \
    training.intra_period=8 training.clip_len=8 training.batch=8 \
    training.num_filters=192 training.latent_filters=192 \
    training.hyper_filters=128 training.latent_stride_div=1 \
    "training.lmbdas=[$lam]" training.steps="$STEPS" \
    training.init_base_from="$donor" 'training.freeze=[base]' \
    training.log_every=500 training.ckpt_every=4000 \
    training.ckpt_root="$tmp" 2>&1 | tee -a runs/r6_temporal_train.log
  mv "$tmp/q1_lmbda${lam}" "$dst"
  rm -rf "$tmp"
done

echo "=== temporal R-D eval (IP=8, held-out motion sequence) ==="
stdbuf -oL python scripts/rd_eval_temporal.py \
  --temporal-root "$ROOT" --intra-root checkpoints/r4_single \
  --intra-period 8 --lmbdas 0.5 4.0 32.0 96.0 \
  --out runs/rd_temporal_r6 --report RD_r06_temporal.json \
  2>&1 | tee runs/r6_temporal_eval.log
echo "=== TEMPORAL R6 DONE ==="
