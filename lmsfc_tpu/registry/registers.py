"""String-keyed plugin registries.

Mirrors the reference's registry contract (compressai_vision/registry/
registers.py:37-113): six global dicts populated by decorator registrars;
config names ARE the plugin API (compressai_vision/config/config.py:64-150).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Type

PIPELINES: Dict[str, Type] = {}
DATACATALOGS: Dict[str, Type] = {}
DATASETS: Dict[str, Type] = {}
VISIONMODELS: Dict[str, Type] = {}
EVALUATORS: Dict[str, Type] = {}
CODECS: Dict[str, Type] = {}


def _make_registrar(table: Dict[str, Any], kind: str) -> Callable:
    def registrar(*names: str):
        def decorator(cls):
            for name in names:
                if name in table:
                    raise KeyError(f"duplicate {kind} registration: {name!r}")
                table[name] = cls
            return cls

        return decorator

    return registrar


register_pipeline = _make_registrar(PIPELINES, "pipeline")
register_datacatalog = _make_registrar(DATACATALOGS, "datacatalog")
register_dataset = _make_registrar(DATASETS, "dataset")
register_vision_model = _make_registrar(VISIONMODELS, "vision model")
register_evaluator = _make_registrar(EVALUATORS, "evaluator")
register_codec = _make_registrar(CODECS, "codec")
