#!/bin/bash
# Round-4 TPU master chain, v2: every TPU-gated VERDICT-r3 item, serialized
# (single chip; never run two TPU jobs concurrently — the axon relay
# wedges). v2 reflects two realities v1 missed:
#   * `timeout` cannot exec a bash FUNCTION (v1's stages died rc=127);
#     stages now run functions via an exported-function bash -c shim.
#   * the session reset wiped checkpoints/ (gitignored): every stage that
#     previously extended a checkpoint now REBUILDS it from scratch, and
#     every training stage exports its params to artifacts/params/ and
#     commits them (scripts/params_store.py) so the next reset cannot
#     zero the round again.
#
# Stage order = VERDICT r3 ranking: perf evidence first (bench), then the
# accuracy-vs-rate artifacts (OIV6, MOT), then ChARM hardening (200k +
# wide eval), temporal last.
#
# Each stage writes a .done marker so the chain resumes after a relay
# wedge kills it partway. Usage: scripts/r5_tpu_chain.sh [first-stage]
set -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
FROM=${1:-1}
mkdir -p runs/chain_r5 artifacts/params

stage() {  # [STAGE_TIMEOUT=s] stage <n> <name> <cmd...>
  local n=$1 name=$2; shift 2
  local marker="runs/chain_r5/$n-$name.done"
  # never start a stage past the deadline: the driver's end-of-round bench
  # must not find the chip busy (a concurrent job skews or wedges it)
  if [ -n "${CHAIN_DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -ge "$CHAIN_DEADLINE_EPOCH" ]; then
    echo "=== stage $n ($name): past deadline, stopping chain ==="; exit 0
  fi
  if [ "$n" -lt "$FROM" ] || [ -f "$marker" ]; then
    echo "=== stage $n ($name): skipped ==="; return 0
  fi
  echo "=== stage $n ($name): start $(date) ==="
  # bash -c shim so exported functions work under timeout (v1 bug: rc=127)
  if timeout "${STAGE_TIMEOUT:-7200}" bash -o pipefail -c '"$@"' -- "$@" \
      2>&1 | tee "runs/chain_r5/$n-$name.log"; then
    touch "$marker"
    milestone_commit "chain r4: stage $n ($name) complete" "$marker" "runs/chain_r5/$n-$name.log"
    echo "=== stage $n ($name): done $(date) ==="
  else
    echo "=== stage $n ($name): FAILED rc=$? $(date) ===" | tee -a "runs/chain_r5/$n-$name.log"
    return 1
  fi
}

milestone_commit() {  # <msg> <path...>  — durable artifacts; never fails the stage
  local msg=$1; shift
  git add -f "$@" >/dev/null 2>&1
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "$msg

No-Verification-Needed: artifact/params-only milestone commit" || true
  fi
}

wait_for_file() {  # <path> <timeout_s> — cross-dependency on the CPU prereq track
  local path=$1 t=${2:-7200} waited=0
  while [ ! -s "$path" ]; do
    if [ "$waited" -ge "$t" ]; then echo "wait_for_file: $path absent after ${t}s" >&2; return 1; fi
    sleep 30; waited=$((waited + 30))
  done
}

bench_ok() {
  # NO heredocs in exported functions: export -f mangles them through the
  # bash -c stage shim (stage 1 died with a python IndentationError)
  python scripts/check_bench_json.py BENCH_inround_r4.json
}

bench_snapshot() {
  # skip the run if a good (non-partial) snapshot already exists
  if bench_ok; then
    echo "existing good BENCH_inround_r4.json; skipping run"
    milestone_commit "Bench snapshot: in-round TPU capture (r4)" \
      BENCH_inround_r4.json runs/bench_inround_r4.stderr.log
    return 0
  fi
  python bench.py > BENCH_inround_r4.json 2> runs/bench_inround_r4.stderr.log
  cat BENCH_inround_r4.json
  # a partial JSON ({"value": null, ...}) means the relay was down: fail
  # the stage so the chain stops and the next healthy window retries
  bench_ok
  local rc=$?
  [ $rc -eq 0 ] && milestone_commit "Bench snapshot: in-round TPU capture (r4)" \
    BENCH_inround_r4.json runs/bench_inround_r4.stderr.log
  return $rc
}

gdn_tpu_test() {
  LMSFC_TEST_TPU=1 python -m pytest tests/test_gdn_tpu.py -x -q
}

TRAIN_COMMON="training.feature_dump_dir=data/train_features training.preload=true
training.num_filters=192 training.latent_filters=192 training.hyper_filters=128
training.latent_stride_div=1
training.batch=32 training.log_every=500 training.ckpt_every=5000"

singles_rebuild() {
  # 4 single-rate models, 25k steps each; top point at lambda=96 (inside
  # the stride-32 saturation knee) per VERDICT r3 item 6 — the q4fix IS
  # the rebuilt grid now, no separate retrain-and-move step.
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $TRAIN_COMMON \
    'training.lmbdas=[0.5,4.0,32.0,96.0]' training.steps=25000 \
    training.ckpt_root=checkpoints/r4_single 2>&1 | tee runs/r5_singles_train.log
  local q=1
  for l in 0.5 4.0 32.0 96.0; do
    python scripts/params_store.py export "checkpoints/r4_single/q${q}_lmbda${l}" \
      "artifacts/params/single_q${q}_lmbda${l}.npz"
    q=$((q + 1))
  done
  milestone_commit "Durable params: rebuilt 25k singles (lambda 0.5/4/32/96)" \
    artifacts/params/single_q*.npz runs/r5_singles_train.log
  # recompute the singles R-D curve on the recalibrated grid (item 6)
  stdbuf -oL python scripts/rd_eval.py \
    --ckpt-root checkpoints --single-dir r4_single \
    --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 96.0 \
    --frames 16 --out runs/rd_r05_single --report RD_r05_single.json \
    2>&1 | tee runs/r5_q4fix_eval.log
  milestone_commit "Singles R-D at the recalibrated lambda grid" \
    RD_r05_single.json runs/rd_r05_single runs/r5_q4fix_eval.log
}

oiv6_sweep() {
  # full re-sweep (not just q4): the detector AND the singles were both
  # rebuilt post-reset, so a self-consistent artifact re-runs every leg
  wait_for_file checkpoints/oiv6_detector/part2.npz 7200 || return 1
  milestone_commit "Durable params: overfit dummy-OIV6 detector" artifacts/params/oiv6_part2.npz
  WITH_BYPASS=1 LMBDAS_OVERRIDE="0.5 4.0 32.0 96.0" \
    CODEC_ARGS="codec.settings.latent_stride_div=1 vision_model.faster_rcnn_R_50_FPN_3x.weights=checkpoints/oiv6_detector/part2.npz" \
    scripts/evaluation/eval_on_mpeg_oiv6_lmsfc.sh \
    data/dummy_oiv6 runs/oiv6_r5 checkpoints/r4_single
  python -m lmsfc_tpu.tools.aggregate cttc runs/oiv6_r5/cttc.csv \
    runs/oiv6_r5/q*/summary.csv runs/oiv6_r5/bypass/summary.csv
  milestone_commit "OIV6 accuracy-vs-rate artifact: full re-sweep on rebuilt weights" runs/oiv6_r5
}

jde_codec_train() {
  scripts/r5_jde_codec.sh
  python scripts/params_store.py export checkpoints/jde_codec/joint \
    artifacts/params/jde_codec_joint.npz
  milestone_commit "Durable params: JDE-pyramid joint codec (25k)" \
    artifacts/params/jde_codec_joint.npz runs/jde_codec_train.log
}

mot_sweep() {
  wait_for_file checkpoints/jde_head/head.npz 7200 || return 1
  milestone_commit "Durable params: dummy-TVD JDE head" artifacts/params/jde_head.npz
  # self-label on the SAME device the eval runs on: gt from the fixed-seed
  # JDE on uncompressed features, so the bypass run reproduces gt exactly
  if [ ! -s data/dummy_tvd/DTVD-01/gt/gt.txt ]; then
    python scripts/make_dummy_tvd.py --out data/dummy_tvd \
      --head checkpoints/jde_head/head.npz --device tpu
  fi
  WITH_BYPASS=1 scripts/evaluation/eval_on_dummy_tvd_lmsfc.sh \
    data/dummy_tvd runs/mot_r5 checkpoints/jde_codec/joint \
    checkpoints/jde_head/head.npz
  milestone_commit "MOT artifact: MOTA-vs-kbps sweep (bypass + 4 qp)" runs/mot_r5 \
    data/dummy_tvd/DTVD-01/gt data/dummy_tvd/DTVD-02/gt
}

JOINT_LMBDAS='[0.5,4.0,32.0,256.0]'

joints_to() {  # <steps> <tag>  — both joints to <steps> (resumes from orbax)
  local steps=$1 tag=$2
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $TRAIN_COMMON \
    "training.lmbdas=$JOINT_LMBDAS" training.num_rates=4 training.steps="$steps" \
    training.ckpt_root=checkpoints/r4_joint 2>&1 | tee "runs/r5_joint${tag}_train.log"
  python scripts/params_store.py export checkpoints/r4_joint/joint \
    "artifacts/params/joint_plain_${tag}.npz"
  milestone_commit "Durable params: plain gain-unit joint @${tag}" \
    "artifacts/params/joint_plain_${tag}.npz" "runs/r5_joint${tag}_train.log"
  stdbuf -oL python -m lmsfc_tpu.run.train --config cfgs/train_lmsfc.yaml $TRAIN_COMMON \
    "training.lmbdas=$JOINT_LMBDAS" training.num_rates=4 training.num_slices=4 \
    training.lrp=true training.steps="$steps" \
    training.ckpt_root=checkpoints/r4_charm 2>&1 | tee "runs/r5_charm${tag}_train.log"
  python scripts/params_store.py export checkpoints/r4_charm/joint \
    "artifacts/params/joint_charm_${tag}.npz"
  milestone_commit "Durable params: ChARM+LRP joint @${tag}" \
    "artifacts/params/joint_charm_${tag}.npz" "runs/r5_charm${tag}_train.log"
}

joints_150k() { joints_to 150000 150k; }
joints_200k() { joints_to 200000 200k; }

headline_eval() {
  stdbuf -oL python scripts/rd_eval.py \
    --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_charm/joint \
    --num-slices 4 --lrp --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 96.0 \
    --frames 64 --seeds 4243 9091 --bootstrap 200 \
    --out runs/rd_r05_charm --report RD_r05_charm.json
  stdbuf -oL python scripts/rd_eval.py \
    --ckpt-root checkpoints --single-dir r4_single --joint-dir r4_joint/joint \
    --latent-stride-div 1 --lmbdas 0.5 4.0 32.0 96.0 \
    --frames 64 --seeds 4243 9091 --bootstrap 200 \
    --out runs/rd_r05_plain --report RD_r05_plain.json
  milestone_commit "Headline eval at 200k: 64 frames x 2 seeds, bootstrap" \
    RD_r05_charm.json RD_r05_plain.json runs/rd_r05_charm runs/rd_r05_plain
}

assemble_report() {
  python scripts/rd_r05_report.py
  milestone_commit "RD_r05.json reassembled" RD_r05.json
}

temporal_rebuild() {
  # lambda grid matches the rebuilt singles (q4 at 96, VERDICT item 6) so
  # every temporal rate point has an intra partner for the BD computation
  STEPS=50000 TEMPORAL_LMBDAS='[0.5,4.0,32.0,96.0]' \
    TEMPORAL_EVAL_LMBDAS='0.5 4.0 32.0 96.0' scripts/r4_temporal.sh
  for d in checkpoints/r4_temporal/q*_lmbda*; do
    [ -d "$d" ] || continue
    python scripts/params_store.py export "$d" "artifacts/params/temporal_$(basename "$d").npz"
  done
  milestone_commit "Durable params: temporal residual coders @50k + R-D artifact" \
    artifacts/params/temporal_*.npz runs/rd_temporal RD_r04_temporal.json runs/r4_temporal_train.log
}

export -f bench_ok bench_snapshot gdn_tpu_test singles_rebuild oiv6_sweep jde_codec_train \
  mot_sweep joints_to joints_150k joints_200k headline_eval assemble_report \
  temporal_rebuild milestone_commit wait_for_file
export TRAIN_COMMON JOINT_LMBDAS

STAGE_TIMEOUT=3600 stage 1 bench bench_snapshot || exit 1
STAGE_TIMEOUT=1800 stage 2 gdn-tpu gdn_tpu_test
STAGE_TIMEOUT=10800 stage 3 singles singles_rebuild || exit 1
stage 4 oiv6 oiv6_sweep
STAGE_TIMEOUT=5400 stage 5 jde-codec jde_codec_train || exit 1
stage 6 mot-sweep mot_sweep
STAGE_TIMEOUT=18000 stage 7 joints-150k joints_150k || exit 1
STAGE_TIMEOUT=10800 stage 8 joints-200k joints_200k || exit 1
STAGE_TIMEOUT=10800 stage 9 headline-eval headline_eval
stage 10 assemble assemble_report
STAGE_TIMEOUT=14400 stage 11 temporal temporal_rebuild
stage 12 reassemble assemble_report
echo "=== CHAIN COMPLETE $(date) ==="
