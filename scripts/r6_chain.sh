#!/bin/bash
# Round-5 TPU master chain: the VERDICT-r4 evidence items, serialized on the
# single chip (never run two TPU jobs concurrently — the axon relay wedges).
#
# Stage order = VERDICT r4 ranking: bench capture first (the un-losable
# rewrite), then the two accuracy-vs-rate artifacts (OIV6, MOT), then the
# temporal fix-or-retire (scripts/r6_temporal.sh, written while the earlier
# stages run — the stage skips gracefully when absent so the chain never
# wedges on it).
#
# Each stage writes a .done marker so the chain resumes after a relay wedge.
# Usage: [CHAIN_DEADLINE_EPOCH=...] scripts/r6_chain.sh [first-stage]
set -o pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
FROM=${1:-1}
mkdir -p runs/chain_r6 artifacts/params

stage() {  # [STAGE_TIMEOUT=s] stage <n> <name> <cmd...>
  local n=$1 name=$2; shift 2
  local marker="runs/chain_r6/$n-$name.done"
  if [ -n "${CHAIN_DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -ge "$CHAIN_DEADLINE_EPOCH" ]; then
    echo "=== stage $n ($name): past deadline, stopping chain ==="; exit 0
  fi
  if [ "$n" -lt "$FROM" ] || [ -f "$marker" ]; then
    echo "=== stage $n ($name): skipped ==="; return 0
  fi
  echo "=== stage $n ($name): start $(date) ==="
  if timeout "${STAGE_TIMEOUT:-7200}" bash -o pipefail -c '"$@"' -- "$@" \
      2>&1 | tee "runs/chain_r6/$n-$name.log"; then
    touch "$marker"
    milestone_commit "chain r5: stage $n ($name) complete" "$marker" "runs/chain_r6/$n-$name.log"
    echo "=== stage $n ($name): done $(date) ==="
  else
    echo "=== stage $n ($name): FAILED rc=$? $(date) ===" | tee -a "runs/chain_r6/$n-$name.log"
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

bench_snapshot() {
  if python scripts/check_bench_json.py BENCH_inround_r5.json; then
    echo "existing good BENCH_inround_r5.json; skipping run"
  else
    python bench.py > BENCH_inround_r5.json 2> runs/bench_inround_r5.stderr.log
    cat BENCH_inround_r5.json
    python scripts/check_bench_json.py BENCH_inround_r5.json || return 1
  fi
  milestone_commit "Bench snapshot: in-round TPU capture (r5)" \
    BENCH_inround_r5.json runs/bench_inround_r5.stderr.log
}

oiv6_fix() {
  DEVICE=tpu scripts/r6_oiv6_fix.sh || return 1
  milestone_commit "OIV6 accuracy-vs-rate artifact: knee-ladder + task-aware NN2" \
    runs/oiv6_r6 artifacts/params/oiv6_part2_v2.npz \
    artifacts/params/oiv6_part2_v2_robust.npz \
    artifacts/params/oiv6_knee_joint.npz \
    runs/oiv6_detector_v2_train.log runs/oiv6_knee_train.log \
    runs/oiv6_detector_v2_robust.log runs/oiv6_recons.log
}

mot_fix() {
  DEVICE=tpu scripts/r6_mot_fix.sh || return 1
  milestone_commit "MOT artifact: wide ladder + task-aware head (MOTA vs kbps)" \
    runs/mot_r6 artifacts/params/jde_codec_joint_wide.npz \
    artifacts/params/jde_head_wide_robust.npz \
    data/dummy_tvd/DTVD-01/gt data/dummy_tvd/DTVD-02/gt \
    runs/jde_codec_wide_train.log runs/jde_head_wide_robust_train.log \
    runs/mot_label_r6.log
}

temporal_fix() {
  scripts/r6_temporal.sh || return 1
  for d in checkpoints/r6_temporal/q*_lmbda*; do
    python scripts/params_store.py export "$d" \
      "artifacts/params/temporal_r6_$(basename "$d").npz" || return 1
  done
  milestone_commit "Temporal v4 artifact: frozen-base predictor R-D at IP=8" \
    RD_r06_temporal.json runs/rd_temporal_r6 runs/r6_temporal_train.log \
    runs/r6_temporal_eval.log artifacts/params/temporal_r6_*.npz
}

oiv6_resweep() {
  # same script as stage 2; all training legs are existence-gated so only
  # the relabel (labeling-params fingerprint changed: exact-emission
  # thresholds) and the 5-leg sweep re-run
  DEVICE=tpu scripts/r6_oiv6_fix.sh || return 1
  milestone_commit "OIV6 artifact v2: exact-emission labels close the bypass gap" \
    runs/oiv6_r6 data/dummy_oiv6/ann.json data/dummy_oiv6/.labeled_by \
    runs/oiv6_relabel.log
}

export -f stage milestone_commit bench_snapshot oiv6_fix mot_fix temporal_fix oiv6_resweep

STAGE_TIMEOUT=2400 stage 1 bench bench_snapshot || exit 1
STAGE_TIMEOUT=10800 stage 2 oiv6-fix oiv6_fix || exit 1
STAGE_TIMEOUT=10800 stage 3 mot-fix mot_fix || exit 1
STAGE_TIMEOUT=7200 stage 5 oiv6-resweep oiv6_resweep
STAGE_TIMEOUT=14400 stage 4 temporal temporal_fix
echo "=== R6 CHAIN COMPLETE $(date) ==="
