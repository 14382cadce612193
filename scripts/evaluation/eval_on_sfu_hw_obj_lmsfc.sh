#!/usr/bin/env bash
# SFU-HW-Objects x L-MSFC sweep: one run per (sequence, rate point).
# Equivalent of the reference's scripts/evaluation/sfu_hw_obj/
# eval_on_sfu_hw_obj_vtm.sh:66-148 (per-sequence tables + Hydra overrides),
# driving the yaml runner with dot-overrides instead.
set -euo pipefail

DATA_ROOT=${1:-./data/SFUHW}
OUT_ROOT=${2:-./runs/sfu_lmsfc}
CKPT_ROOT=${3:-./checkpoints}

# sequence -> frame_rate (intra period fixed to 1 for the learned codec)
declare -A SEQS=(
  [Traffic_2560x1600_30]=30   [ParkScene_1920x1080_24]=24
  [Cactus_1920x1080_50]=50    [BasketballDrive_1920x1080_50]=50
  [BQTerrace_1920x1080_60]=60 [BasketballDrill_832x480_50]=50
  [BQMall_832x480_60]=60      [PartyScene_832x480_50]=50
  [RaceHorsesC_832x480_30]=30 [BasketballPass_416x240_50]=50
  [BQSquare_416x240_60]=60    [BlowingBubbles_416x240_50]=50
  [RaceHorses_416x240_30]=30  [Kimono_1920x1080_24]=24
)

LMBDAS=(0.0125 0.025 0.05 0.1)

for seq in "${!SEQS[@]}"; do
  for i in "${!LMBDAS[@]}"; do
    q=$((i + 1))
    python -m lmsfc_tpu.run.eval_split_inference \
      --config cfgs/eval_split_inference_example.yaml \
      dataset.config.root="${DATA_ROOT}/${seq}" \
      pipeline.output_dir="${OUT_ROOT}/${seq}/q${q}" \
      pipeline.codec_output_dir="${OUT_ROOT}/${seq}/q${q}/codec" \
      codec.settings.qp="${q}" \
      codec.settings.checkpoint_dir="${CKPT_ROOT}/q${q}_lmbda${LMBDAS[$i]}" \
      misc.overwrite_results=true
  done
done

python -m lmsfc_tpu.tools.aggregate cttc "${OUT_ROOT}/cttc.csv" \
  "${OUT_ROOT}"/*/q*/summary.csv
