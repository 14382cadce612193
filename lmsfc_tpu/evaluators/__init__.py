from .base_evaluator import BaseEvaluator
from .coco import COCOEval
from .mot import MOTEval

__all__ = ["BaseEvaluator", "COCOEval", "MOTEval"]
from .oid_challenge import OpenImagesChallengeEval  # noqa: F401,E402
from .yolo import YOLOEval  # noqa: F401,E402
