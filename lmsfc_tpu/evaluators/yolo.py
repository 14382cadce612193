"""YOLO evaluator — registered placeholder (the reference ships an empty
registered stub, evaluators/evaluators.py:596-601; a COCO-protocol mAP over
YOLO detections is what it would compute, so delegate to COCOEval)."""

from __future__ import annotations

from ..registry import register_evaluator
from .coco import COCOEval


@register_evaluator("YOLO-EVAL")
class YOLOEval(COCOEval):
    pass
