#!/bin/bash
# Extend the 4 single-rate temporal residual coders (default 24k -> 36k)
# and re-emit the sequence-level R-D artifact. The 24k artifact's honest
# weakness is reconstruction quality (33.7 dB top vs intra's ~36 dB,
# BD-PSNR -4.1 dB) at already-strong 62-78% inter-frame bit savings —
# budget moves the quality axis, the architecture already owns the rate
# axis.
#
# Usage: [STEPS=36000] scripts/r4_temporal_extend.sh [pidfile-to-wait-on]
set -e -o pipefail
cd "$(dirname "$0")/.."

if [ -n "$1" ] && [ -f "$1" ]; then
  while kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
fi

STEPS=${STEPS:-36000} exec scripts/r4_temporal.sh
