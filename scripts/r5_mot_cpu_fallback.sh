#!/bin/bash
# CPU fallback for the MOT artifact (VERDICT r3 item 3), for the case the
# TPU relay never recovers this round (it was wedged from round start; the
# TPU master chain runs the full version as stages 5-6 when it can).
#
# Same protocol as the chain's mot_sweep, everything on CPU and kept in
# SEPARATE dirs (data/dummy_tvd_cpu, runs/mot_r5_cpu) so the chain's
# device-matched gt discipline is untouched: gt must come from the same
# device the eval runs on, or bypass no longer reproduces gt exactly.
#
# The codec train is shared work: it resumes/extends checkpoints/jde_codec
# which the TPU stage 5 would also resume. Run it in guarded slices via
# scripts/cpu_guard.sh so a recovering relay preempts us within seconds.
#
# Usage: [STEPS=4000] scripts/r5_mot_cpu_fallback.sh [label|sweep|all]
set -e -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
STEPS=${STEPS:-4000}
MODE=${1:-all}

train() {
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml \
    training.device=cpu \
    training.feature_dump_dir=data/train_features_jde training.preload=true \
    'training.channels=[256,512,1024]' 'training.base_hw=[32,48]' \
    training.num_filters=128 training.latent_filters=128 training.hyper_filters=96 \
    'training.lmbdas=[0.5,4.0,32.0,256.0]' training.num_rates=4 \
    training.batch=16 training.steps="$STEPS" \
    training.log_every=100 training.ckpt_every=500 \
    training.ckpt_root=checkpoints/jde_codec 2>&1 | tee -a runs/jde_codec_train_cpu.log
}

label() {
  # self-label on CPU: gt from the fixed-seed JDE on uncompressed frames,
  # evaluated on the SAME device below, so bypass reproduces gt exactly
  python scripts/make_dummy_tvd.py --out data/dummy_tvd_cpu \
    --head checkpoints/jde_head/head.npz --device cpu
}

sweep() {
  WITH_BYPASS=${WITH_BYPASS:-1} CODEC_ARGS="misc.device=cpu" \
    scripts/evaluation/eval_on_dummy_tvd_lmsfc.sh \
    data/dummy_tvd_cpu runs/mot_r5_cpu checkpoints/jde_codec/joint \
    checkpoints/jde_head/head.npz
}

case "$MODE" in
  train) train ;;
  label) label ;;
  sweep) sweep ;;
  all) train; label; sweep ;;
  *) echo "unknown mode $MODE" >&2; exit 2 ;;
esac
