"""Evaluator contract (ref compressai_vision/evaluators/base_evaluator.py:38-83):
digest(gt, pred) per frame, results(save_path) at the end, reset() between
sequences. Result JSON naming: {Class}_on_{catalog}_{dataset}.json.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional


class BaseEvaluator:
    def __init__(self, datacatalog: Any = None, dataset: Any = None, criteria: str = "", **kwargs):
        self.datacatalog = datacatalog
        self.dataset = dataset
        self.criteria = criteria
        self.reset()

    def reset(self) -> None:
        self._predictions: List = []

    def digest(self, gt: Any, pred: Any) -> None:
        raise NotImplementedError

    def results(self, save_path: Optional[str] = None) -> Dict:
        raise NotImplementedError

    def _dump(self, out: Dict, save_path: Optional[str]) -> None:
        if save_path is None:
            return
        path = Path(save_path)
        path.mkdir(parents=True, exist_ok=True)
        cat = getattr(self.datacatalog, "name", "catalog")
        ds = getattr(self.datacatalog, "dataset_name", "dataset")
        name = f"{self.__class__.__name__}_on_{cat}_{ds}.json"
        with open(path / name, "w") as f:
            json.dump(out, f, indent=2, default=float)
