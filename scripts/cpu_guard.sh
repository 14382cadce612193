#!/bin/bash
# Run a CPU job, but kill it within ~5 s if the TPU watcher launches the
# master chain: the box has ONE core, so a concurrent CPU job would skew
# the chain's bench stage (and slow every TPU stage behind it).
#
# Usage: scripts/cpu_guard.sh <cmd...>
# Exit: the command's rc, or 143 if killed by the guard.
cd "$(dirname "$0")/.."
WATCH_LOG=runs/r5_watch.log
# grep -c prints the 0 itself on no-match (and exits 1) — no || fallback
count_launches() { grep -c "launching chain" "$WATCH_LOG" 2>/dev/null | head -1; }
baseline=$(count_launches); baseline=${baseline:-0}

setsid "$@" &
pid=$!
trap 'kill -- -"$pid" 2>/dev/null' EXIT
while kill -0 "$pid" 2>/dev/null; do
  now=$(count_launches); now=${now:-0}
  if [ "$now" -gt "$baseline" ]; then
    echo "=== cpu_guard: TPU chain launched; killing CPU job (pid $pid) ===" >&2
    kill -- -"$pid" 2>/dev/null
    sleep 2
    kill -9 -- -"$pid" 2>/dev/null
    wait "$pid" 2>/dev/null
    exit 143
  fi
  sleep 5
done
wait "$pid"
