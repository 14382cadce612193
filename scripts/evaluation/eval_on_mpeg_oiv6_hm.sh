#!/usr/bin/env bash
# MPEG-OIV6 (stills) x HM anchor sweep — image split-inference, bpp.
set -euo pipefail
cd "$(dirname "$0")/../.."

CODEC=${CODEC:-hm}
DATASET_TYPE=Detectron2Dataset
DATACATALOG=MPEGOIV6
ARCH=${ARCH:-faster_rcnn_X_101_32x8d_FPN_3x}
EVALUATOR=OIC-EVAL
CRITERIA=mAP@0.5IOU
EVAL_ENCODE=bpp
PIPE_TYPE=image
ANNOTATION_FILE=${ANNOTATION_FILE:-annotations/instances.json}

declare -A SEQS=( [mpeg-oiv6-detection]=1:1 )

source scripts/evaluation/_anchor_sweep_common.sh
run_sweep
