#!/usr/bin/env bash
# TVD object tracking x VTM anchor sweep (ref eval_on_tvd_vtm.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."

CODEC=${CODEC:-vtm}
DATASET_TYPE=TrackingDataset
DATACATALOG=MPEGTVDTRACKING
ARCH=jde_1088x608
EVALUATOR=MOT-TVD-EVAL
CRITERIA=mota
EVAL_ENCODE=bitrate
PIPE_TYPE=video
ANNOTATION_FILE=gt/gt.txt

# TVD sequences: intra_period:frame_rate (ref tvd tables)
declare -A SEQS=(
  [TVD-01]=64:50 [TVD-02]=64:50 [TVD-03]=64:50
)

source scripts/evaluation/_anchor_sweep_common.sh
run_sweep
