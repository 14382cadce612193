#!/bin/bash
# Post-reset self-driving supervisor: finishes the CPU prereq track, makes
# its products durable, then hands off to the TPU watcher -> master chain.
# Run detached (setsid) so it survives the session: the whole round keeps
# moving even if no interactive session is alive.
#
# Usage: [DETECTOR_PID=n] scripts/r5_resume.sh
cd "$(dirname "$0")/.."
echo "=== supervisor start $(date) ==="

# 0. an orphaned detector trainer from a killed session may still be
#    running (we resume it with SIGCONT rather than retraining)
if [ -n "${DETECTOR_PID:-}" ]; then
  kill -CONT "$DETECTOR_PID" 2>/dev/null
  while kill -0 "$DETECTOR_PID" 2>/dev/null; do sleep 20; done
  echo "--- orphaned detector trainer ($DETECTOR_PID) finished $(date)"
fi

# 1. CPU prereqs (idempotent: skips whatever already exists)
bash scripts/r6_prereqs.sh 2>&1 | tee -a runs/r6_prereqs.log

# 2. durable copies of the CPU-trained params + commit
mkdir -p artifacts/params
[ -f checkpoints/oiv6_detector/part2.npz ] && \
  cp -n checkpoints/oiv6_detector/part2.npz artifacts/params/oiv6_part2.npz
[ -f checkpoints/jde_head/head.npz ] && \
  cp -n checkpoints/jde_head/head.npz artifacts/params/jde_head.npz
git add -f artifacts/params/oiv6_part2.npz artifacts/params/jde_head.npz \
  runs/oiv6_detector_train.log runs/jde_head_train.log runs/r6_prereqs.log 2>/dev/null
if ! git diff --cached --quiet 2>/dev/null; then
  git commit -q -m "Durable params: CPU-trained OIV6 detector + JDE head

No-Verification-Needed: artifact/params-only milestone commit" || true
fi

# 3. chain deadline: round start from the driver's own progress feed;
#    leave the chip free for the driver's end-of-round bench
if [ -z "${CHAIN_DEADLINE_EPOCH:-}" ]; then
  CHAIN_DEADLINE_EPOCH=$(python - <<'EOF'
import json
rows = [json.loads(l) for l in open("PROGRESS.jsonl") if l.strip()]
last = rows[-1]
print(int(last["ts"] - last["wall_s"] + 12 * 3600 - 2400))
EOF
  )
fi
export CHAIN_DEADLINE_EPOCH
echo "--- chain deadline: $(date -d @"$CHAIN_DEADLINE_EPOCH" 2>/dev/null || echo "$CHAIN_DEADLINE_EPOCH")"

# 4. TPU watcher -> master chain (resumable via stage markers)
exec scripts/r5_tpu_watch.sh
