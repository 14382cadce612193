#!/usr/bin/env bash
# SFU-HW-Objects x VTM anchor sweep (ref eval_on_sfu_hw_obj_vtm.sh:66-148).
set -euo pipefail
cd "$(dirname "$0")/../.."

CODEC=${CODEC:-vtm}
DATASET_TYPE=Detectron2Dataset
DATACATALOG=SFUHW
ARCH=${ARCH:-faster_rcnn_X_101_32x8d_FPN_3x}
EVALUATOR=COCO-EVAL
CRITERIA=AP50
EVAL_ENCODE=bitrate
PIPE_TYPE=video

# sequence -> intra_period:frame_rate (ref tables :63-106)
declare -A SEQS=(
  [Traffic_2560x1600_30_val]=32:30       [Kimono_1920x1080_24_val]=32:24
  [ParkScene_1920x1080_24_val]=32:24     [Cactus_1920x1080_50_val]=64:50
  [BasketballDrive_1920x1080_50_val]=64:50 [BasketballDrill_832x480_50_val]=64:50
  [BQTerrace_1920x1080_60_val]=64:60     [BQSquare_416x240_60_val]=64:60
  [PartyScene_832x480_50_val]=64:50      [RaceHorses_832x480_30_val]=32:30
  [RaceHorses_416x240_30_val]=32:30      [BlowingBubbles_416x240_50_val]=64:50
  [BasketballPass_416x240_50_val]=64:50  [BQMall_832x480_60_val]=64:60
)

source scripts/evaluation/_anchor_sweep_common.sh
run_sweep
