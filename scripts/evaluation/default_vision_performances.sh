#!/usr/bin/env bash
# Uncompressed-accuracy harness: all workloads with the bypass codec.
# Equivalent of scripts/evaluation/default_vision_performances.sh:44-80 —
# validates the environment and produces the accuracy upper bounds.
set -euo pipefail
OUT_ROOT=${1:-./runs/uncompressed}

python -m lmsfc_tpu.run.eval_split_inference \
  --config cfgs/eval_split_inference_example.yaml \
  codec.type=bypass \
  pipeline.output_dir="${OUT_ROOT}/sfu" \
  pipeline.codec_output_dir="${OUT_ROOT}/sfu/codec" \
  pipeline.conformance=true \
  misc.overwrite_results=true
