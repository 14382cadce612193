#!/bin/bash
# TPU relay health watcher for the round-5 chain (scripts/r6_chain.sh).
# The axon relay wedges for an hour+ after a killed mid-transfer process;
# poll with a small killable probe and (re)launch the resumable chain at
# every healthy window. See scripts/r5_tpu_watch.sh (round 4) for history.
#
# Usage: scripts/r6_watch.sh [first-stage-number]
cd "$(dirname "$0")/.."
FROM=${1:-1}
while true; do
  if timeout 120 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
EOF
  then
    echo "=== TPU healthy $(date); launching r6 chain from stage $FROM ==="
    if scripts/r6_chain.sh "$FROM"; then
      echo "=== WATCHER: chain complete $(date) ==="
      exit 0
    fi
    echo "--- chain failed $(date); back to polling (stage markers preserve progress)"
  fi
  echo "--- TPU unavailable $(date); retry in 180s"
  sleep 180
done
