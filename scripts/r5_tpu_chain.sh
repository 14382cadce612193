#!/bin/bash
# Round-4 TPU master chain: every TPU-gated VERDICT-r3 item, serialized
# (single chip; never run two TPU jobs concurrently — the axon relay
# wedges). Ordered so the round's PERF EVIDENCE lands first: a relay
# wedge killed round 3's bench (BENCH_r03.json rc=1), so the first
# healthy window must capture the bench snapshot before any long train.
#
#   1. bench.py -> BENCH_inround_r4.json (VERDICT item 1)
#   2. GDN Pallas TPU equivalence test  (item 7)
#   3. q4 lambda-96 retrain + single re-eval (item 6)
#   4. OIV6 q4 re-run + re-aggregate (item 2)
#   5. JDE-pyramid codec train (item 3)
#   6. MOT sweep: self-label on TPU + bypass + 4 qp (item 3)
#   7. joints 150k->200k (item 5)
#   8. multi-seed headline eval with bootstrap spread (item 5)
#   9. assemble RD_r05.json
#  10. temporal residual-coder extension (item 4, lowest-ranked long job)
#  11. reassemble RD_r05.json with the refreshed temporal section
#
# Each stage writes a .done marker so the chain is resumable after a
# relay wedge kills it partway.
#
# Usage: scripts/r5_tpu_chain.sh [first-stage-number]
set -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
FROM=${1:-1}
mkdir -p runs/chain_r5

stage() {  # [STAGE_TIMEOUT=s] stage <n> <name> <cmd...>
  # Every stage runs under a generous timeout: a wedged relay HANGS ops
  # rather than failing them, and a silently-stalled stage would otherwise
  # block the rest of the chain for the whole round.
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
  if timeout "${STAGE_TIMEOUT:-7200}" "$@" 2>&1 | tee "runs/chain_r5/$n-$name.log"; then
    touch "$marker"
    echo "=== stage $n ($name): done $(date) ==="
  else
    echo "=== stage $n ($name): FAILED rc=$? $(date) ===" | tee -a "runs/chain_r5/$n-$name.log"
    return 1
  fi
}

bench_snapshot() {
  # supervisor prints exactly one JSON line on stdout (logs go to stderr)
  python bench.py > BENCH_inround_r4.json
  cat BENCH_inround_r4.json
  # a partial JSON ({"value": null, ...}) means the relay was down: fail
  # the stage so the chain stops and the next healthy window retries
  python - <<'EOF'
import json, sys
d = json.load(open("BENCH_inround_r4.json"))
sys.exit(0 if d.get("value") is not None else 1)
EOF
}

gdn_tpu_test() {
  LMSFC_TEST_TPU=1 python -m pytest tests/test_gdn_tpu.py -x -q
}

oiv6_q4_rerun() {
  # re-run ONLY the top rate point with the lambda-96 checkpoint, then
  # re-aggregate the full sweep (bypass bound included)
  python -m lmsfc_tpu.run.eval_split_inference \
    --config cfgs/eval_split_inference_example.yaml \
    vision_model.arch=faster_rcnn_R_50_FPN_3x \
    vision_model.faster_rcnn_R_50_FPN_3x.weights=checkpoints/oiv6_detector/part2.npz \
    dataset.datacatalog=MPEGOIV6 \
    dataset.config.root=data/dummy_oiv6 \
    pipeline.type=image \
    evaluator.type=OIC-EVAL \
    codec.settings.qp=4 \
    codec.settings.checkpoint_dir=checkpoints/r4_single/q4_lmbda96.0 \
    codec.settings.latent_stride_div=1 \
    pipeline.output_dir=runs/oiv6_r5/q4 \
    pipeline.codec_output_dir=runs/oiv6_r5/q4/codec \
    misc.overwrite_results=true
  python -m lmsfc_tpu.tools.aggregate cttc runs/oiv6_r5/cttc.csv \
    runs/oiv6_r5/q*/summary.csv runs/oiv6_r5/bypass/summary.csv
}

mot_sweep() {
  # self-label on the SAME device the eval runs on: gt from the fixed-seed
  # JDE on uncompressed frames, so the bypass run reproduces gt exactly
  # (cpu-labeled gt would differ from tpu eval arithmetic at box margins)
  if [ ! -s data/dummy_tvd/DTVD-01/gt/gt.txt ]; then
    python scripts/make_dummy_tvd.py --out data/dummy_tvd \
      --head checkpoints/jde_head/head.npz --device tpu
  fi
  WITH_BYPASS=1 scripts/evaluation/eval_on_dummy_tvd_lmsfc.sh \
    data/dummy_tvd runs/mot_r5 checkpoints/jde_codec/joint \
    checkpoints/jde_head/head.npz
}

stage 1 bench bench_snapshot || exit 1
stage 2 gdn-tpu gdn_tpu_test
stage 3 q4fix scripts/r5_q4fix.sh || exit 1
stage 4 oiv6-q4 oiv6_q4_rerun
stage 5 jde-codec scripts/r5_jde_codec.sh || exit 1
stage 6 mot-sweep mot_sweep
# ChARM hardening (VERDICT item 5: 200k + wider eval) outranks the
# temporal extension (item 4), so it runs first — if the relay recovers
# late and the deadline cuts the chain, the higher-ranked evidence lands
STAGE_TIMEOUT=14400 stage 7 extend200k scripts/r4_extend200k.sh
stage 8 headline-eval bash -c '
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
'
stage 9 assemble python scripts/rd_r05_report.py
STAGE_TIMEOUT=14400 stage 10 temporal env STEPS=50000 scripts/r4_temporal_extend.sh
stage 11 reassemble python scripts/rd_r05_report.py
echo "=== CHAIN COMPLETE $(date) ==="
