"""Vision-model wrapper contract — the "split model" layer.

Mirrors compressai_vision/model_wrappers/base_wrapper.py:37-75:
`input_to_features` (NN-Part1), `features_to_output` (NN-Part2),
`deeper_features_for_accuracy_proxy` (task-proxy loss hook for RD training),
and `forward` (full model, for remote-inference pipelines).
"""

from __future__ import annotations

from typing import Any, Dict, List


class BaseWrapper:
    def input_to_features(self, x: List[Dict], device: str = "tpu") -> Dict:
        """NN-Part1: images -> {"data": {level: [N,C,H,W]}, ...metadata}."""
        raise NotImplementedError

    def features_to_output(self, x: Dict, device: str = "tpu") -> Any:
        """NN-Part2: decoded features -> task predictions."""
        raise NotImplementedError

    def deeper_features_for_accuracy_proxy(self, x: Dict) -> Any:
        """Cheap task-proxy tensors for RD training losses (optional)."""
        raise NotImplementedError

    def forward(self, x: Any) -> Any:
        """Full model on raw input (remote-inference pipelines)."""
        raise NotImplementedError

    @property
    def split_layer_list(self) -> List[str]:
        raise NotImplementedError
