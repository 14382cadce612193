"""Timing and metric-buffer helpers (ref compressai_vision/utils/misc.py:36-56)."""

from __future__ import annotations

import time
from typing import Dict, List


def time_measure() -> float:
    return time.perf_counter()


class metric_tracking:
    """Accumulating metric buffer with sum/avg, as in utils/misc.py:44-56."""

    def __init__(self, name: str = ""):
        self.name = name
        self._vals: List[float] = []

    def append(self, v: float) -> None:
        self._vals.append(float(v))

    @property
    def sum(self) -> float:
        return float(sum(self._vals))

    @property
    def avg(self) -> float:
        return self.sum / len(self._vals) if self._vals else 0.0

    def __len__(self) -> int:
        return len(self._vals)


class StageTimer:
    """Per-stage wall-time accumulation for pipelines.

    Ref: per-segment `timing` dict updates in
    pipelines/split_inference/video_split_inference.py:102-228.
    """

    def __init__(self, stages):
        self.times: Dict[str, float] = {s: 0.0 for s in stages}
        self._t0: float = 0.0
        self._stage: str = ""

    def start(self, stage: str) -> None:
        self._stage = stage
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times[self._stage] = self.times.get(self._stage, 0.0) + dt
        return dt
