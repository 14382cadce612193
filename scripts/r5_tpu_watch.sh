#!/bin/bash
# TPU relay health watcher: the axon relay wedges for an hour+ after a
# killed mid-transfer process (see docs/tpu_box.md), and round 3 lost its
# bench to exactly that. Poll with a small killable probe; at the first
# healthy window, exec the round-4 master chain (resumable via its stage
# markers, so re-running this watcher after a mid-chain wedge continues
# where it left off).
#
# Usage: scripts/r5_tpu_watch.sh [first-stage-number]
cd "$(dirname "$0")/.."
FROM=${1:-1}
while true; do
  if timeout 120 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
EOF
  then
    echo "=== TPU healthy $(date); launching chain from stage $FROM ==="
    if scripts/r5_tpu_chain.sh "$FROM"; then
      echo "=== WATCHER: chain complete $(date) ==="
      exit 0
    fi
    echo "--- chain failed $(date); back to polling (stage markers preserve progress)"
  fi
  echo "--- TPU unavailable $(date); retry in 180s"
  sleep 180
done
