#!/usr/bin/env bash
# Repair the OIV6 accuracy-vs-rate artifact (VERDICT r4 next #1).
#
# Root causes measured by scripts/diag_oiv6.py on the committed state:
#   0. THE r4 NAN/LOW-mAP REGRESSION: ann.json is self-labeled by a specific
#      detector; the healthy 76.5 run relabeled with its (never-committed)
#      detector, whose checkpoint was later overwritten — every detector
#      since has been scored against a lost model's labels. Fix: step 4.5
#      relabels with the detector the sweep evaluates (fingerprint-gated).
#   1. detector undertrained: clean recovery 69.4% (old artifact's detector
#      hit bypass mAP 76.5; the post-reset 800-step rebuild regressed it)
#   2. the lambda grid [0.5..96] sits ABOVE the codec's distortion knee:
#      6.5x the bits (q1->q3) buys 4% lower MSE, so accuracy cannot respond
#      to rate no matter how good the detector is
#   3. codec error is STRUCTURED: at equal rms it costs ~2x more recovery
#      than gaussian noise -> noise augmentation alone cannot robustify the
#      heads; they must train on real codec reconstructions (same fix as
#      the MOT head, scripts/train_jde_head_sup.py --recons)
#
# Produces runs/oiv6_r6: bypass + 4-rate sweep where the rate ladder spans
# the knee (lambda 0.01/0.1/1/16, one gain-unit joint) and NN-Part2 is
# trained long enough (clean) then fine-tuned across {clean, q1..q4}.
# Reference protocol: split-inference eval over MPEGOIV6 + OpenImages
# challenge mAP (ref compressai_vision/evaluators/evaluators.py OIC eval,
# scripts/evaluation/mpeg_oiv6/*).
#
# Usage: [DEVICE=tpu] [BASE_STEPS=6000] [JOINT_STEPS=50000]
#        [ROBUST_STEPS=2500] [DEADLINE_EPOCH=0] scripts/r6_oiv6_fix.sh
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
DEVICE=${DEVICE:-tpu}
BASE_STEPS=${BASE_STEPS:-6000}
JOINT_STEPS=${JOINT_STEPS:-50000}
ROBUST_STEPS=${ROBUST_STEPS:-2500}
OUT_ROOT=${OUT_ROOT:-runs/oiv6_r6}
KNEE_LMBDAS='[0.01,0.1,1.0,16.0]'
DET=checkpoints/oiv6_detector/part2_v2.npz
DET_ROBUST=checkpoints/oiv6_detector/part2_v2_robust.npz

# deps that the reset wipes (clean feature dumps for codec training)
scripts/r6_prereqs.sh

# --- 1. base detector: long clean training (target >=95% recovery) ---
if [ ! -f "$DET" ]; then
  stdbuf -oL python scripts/train_dummy_oiv6_detector.py \
    --data data/dummy_oiv6 --out "$DET" \
    --steps "$BASE_STEPS" --device "$DEVICE" \
    2>&1 | tee runs/oiv6_detector_v2_train.log
  cp "$DET" artifacts/params/oiv6_part2_v2.npz
fi

# --- 2. knee-spanning gain-unit joint codec on the FPN feature dumps ---
if [ ! -d checkpoints/oiv6_knee/joint ]; then
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml \
    training.feature_dump_dir=data/train_features training.preload=true \
    training.num_filters=192 training.latent_filters=192 \
    training.hyper_filters=128 training.latent_stride_div=1 \
    "training.lmbdas=${KNEE_LMBDAS}" training.num_rates=4 \
    training.aux_learning_rate=5.0e-3 \
    training.batch=32 training.steps="$JOINT_STEPS" \
    training.log_every=2000 training.ckpt_every=10000 \
    training.ckpt_root=checkpoints/oiv6_knee \
    2>&1 | tee runs/oiv6_knee_train.log
  python scripts/params_store.py export checkpoints/oiv6_knee/joint \
    artifacts/params/oiv6_knee_joint.npz
fi

# --- 3. codec recons of the 6 images at q1..q4 (freshness tied to the
# checkpoint CONTENT via a stored fingerprint; ADVICE r4: bare existence
# gating let stale recons survive a codec retrain) ---
if ! python scripts/check_recons_fresh.py \
    data/dummy_oiv6/_feat_recons.npz checkpoints/oiv6_knee/joint; then
  stdbuf -oL python scripts/make_oiv6_codec_recons.py \
    --ckpt checkpoints/oiv6_knee/joint \
    --out data/dummy_oiv6/_feat_recons.npz --device cpu \
    2>&1 | tee runs/oiv6_recons.log
fi

# --- 4. task-aware fine-tune across {clean, q1..q4} ---
if [ ! -f "$DET_ROBUST" ]; then
  stdbuf -oL python scripts/train_dummy_oiv6_detector.py \
    --data data/dummy_oiv6 --out "$DET_ROBUST" \
    --init "$DET" --recons data/dummy_oiv6/_feat_recons.npz \
    --steps "$ROBUST_STEPS" --max-noise 0.1 --lr 2e-4 --device "$DEVICE" \
    2>&1 | tee runs/oiv6_detector_v2_robust.log
  cp "$DET_ROBUST" artifacts/params/oiv6_part2_v2_robust.npz
fi

# --- 4.5 RELABEL with the detector the sweep evaluates ---
# The self-labeled protocol REQUIRES labels from the SAME model under eval
# (make_dummy_oiv6.py --weights help text; the healthy r4 run's src.patch
# shows exactly this ann.json rewrite). The r6 chain's first failure
# (bypass mAP 24.3) was evaluating the rebuilt detector against the LOST
# detector's labels. Idempotent via a fingerprint sidecar.
#
# Labeling thresholds MUST equal the wrapper's emission surface
# (rcnn_heads.py: SCORE_THRESH 0.05, 100 detections/image). The first r6
# sweep labeled top-12 @ >=0.2 while eval emits everything >=0.05: the
# unlabeled mid-score detections become cross-image false positives that
# outrank other images' true positives inside a class, capping bypass mAP
# at 48.3 even though the detector reproduces its own labels exactly.
LABEL_ARGS="--score-thr 0.05 --max-det 100"
FP="$(md5sum "$DET_ROBUST" | cut -d' ' -f1) ${LABEL_ARGS}"
if [ "$(cat data/dummy_oiv6/.labeled_by 2>/dev/null)" != "$FP" ]; then
  stdbuf -oL python scripts/make_dummy_oiv6.py \
    --out data/dummy_oiv6 --n 6 ${LABEL_ARGS} \
    --weights "$DET_ROBUST" --device "$DEVICE" \
    2>&1 | tee runs/oiv6_relabel.log
  echo "$FP" > data/dummy_oiv6/.labeled_by
fi

# --- 5. bypass + 4-rate sweep -> runs/oiv6_r6 (nan rows fail the aggregate) ---
rm -rf "$OUT_ROOT"
# resize_input=false: the overfit detector is trained on native-resolution
# features (train_dummy_oiv6_detector.py wrapper); the D2 default 800px
# test resize would hand it OOD-scale features (r6 first attempt: bypass
# accuracy 0.0 for exactly this reason — r4 provenance configs all carry
# resize_input: false)
# exact-emission labels make bypass ~perfect by construction; gate hard
WITH_BYPASS=1 BYPASS_MIN_ACC=90 LMBDAS_OVERRIDE="0.01 0.1 1.0 16.0" \
  JOINT_CKPT=checkpoints/oiv6_knee/joint \
  CODEC_ARGS="codec.settings.latent_stride_div=1 vision_model.faster_rcnn_R_50_FPN_3x.weights=${DET_ROBUST} vision_model.faster_rcnn_R_50_FPN_3x.resize_input=false misc.device=${DEVICE}" \
  scripts/evaluation/eval_on_mpeg_oiv6_lmsfc.sh \
  data/dummy_oiv6 "$OUT_ROOT"

shopt -s nullglob
summaries=("$OUT_ROOT"/q*/summary.csv "$OUT_ROOT"/bypass/summary.csv)
[ ${#summaries[@]} -gt 0 ] || { echo "no summaries produced"; exit 1; }
python -m lmsfc_tpu.tools.aggregate cttc "$OUT_ROOT/cttc.csv" "${summaries[@]}"
cat "$OUT_ROOT/cttc.csv"
echo "=== OIV6 FIX DONE ==="
