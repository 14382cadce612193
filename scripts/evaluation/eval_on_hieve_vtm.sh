#!/usr/bin/env bash
# HiEve tracking x VTM anchor sweep (ref eval_on_hieve_vtm.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."

CODEC=${CODEC:-vtm}
DATASET_TYPE=TrackingDataset
DATACATALOG=MPEGHIEVE
ARCH=jde_1088x608
EVALUATOR=MOT-HIEVE-EVAL
CRITERIA=mota
EVAL_ENCODE=bitrate
PIPE_TYPE=video
ANNOTATION_FILE=gt/gt.txt
EXTRA_PARAMS='vision_model.jde_1088x608.splits=[75,90,105]'

declare -A SEQS=(
  [13_HiEve]=32:25 [16_HiEve]=32:25 [2_HiEve]=32:25 [17_HiEve]=32:25 [18_HiEve]=32:25
)

source scripts/evaluation/_anchor_sweep_common.sh
run_sweep
