#!/usr/bin/env bash
# Re-run the MOT artifact with the SUPERVISED JDE head (VERDICT r3 item 3).
#
# The r4 chain's stage 6 produced nan MOTA twice over: (a) the label pass
# crashed writing gt.txt (missing gt/ dir, fixed in make_dummy_tvd.py) so
# num_gt=0 for every leg, and (b) the noise-distilled head was degenerate
# (random-init decisions as targets -> ~1440 tracks/frame). The head is now
# trained on the generator's TRUE boxes (scripts/train_jde_head_sup.py);
# this script re-labels with it and re-runs the sweep.
#
# Serialized TPU use only — run after the r5 chain has completed.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
DEVICE=${DEVICE:-tpu}

# stale degenerate labels must not survive a partial rerun
rm -f data/dummy_tvd/DTVD-*/gt/gt.txt

# threshold chosen from the trained head's conf histogram: 0.8 keeps
# ~13 pre-NMS dets/frame (true objects: ~6/frame) with a wide margin for
# codec-error-driven degradation. Label pass and eval sweep MUST agree.
CONF=${CONF:-0.8}

stdbuf -oL python scripts/make_dummy_tvd.py --out data/dummy_tvd \
  --head checkpoints/jde_head/head.npz --device "$DEVICE" \
  --conf-thres "$CONF" 2>&1 | tee runs/mot_label.log
for seq in data/dummy_tvd/DTVD-*/; do
  test -s "${seq}gt/gt.txt" || { echo "no gt for ${seq}"; exit 1; }
  wc -l "${seq}gt/gt.txt"
done

rm -rf runs/mot_r5
WITH_BYPASS=1 CODEC_ARGS="vision_model.jde_1088x608.conf_thres=${CONF}" \
  scripts/evaluation/eval_on_dummy_tvd_lmsfc.sh \
  data/dummy_tvd runs/mot_r5 checkpoints/jde_codec/joint \
  checkpoints/jde_head/head.npz 2>&1 | tee runs/mot_sweep_fix.log

cat runs/mot_r5/cttc.csv
