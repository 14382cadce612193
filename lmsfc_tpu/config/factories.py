"""Factories: instantiate plugins from config by registry key.

Mirrors compressai_vision/config/config.py:58-150 (create_vision_model /
create_dataloader / create_evaluator / create_pipline / create_codec): the
string in the config selects the class out of the registry; the codec gets the
vision model and dataset injected so it can reuse packing geometry and
dataset-global min/max constants.
"""

from __future__ import annotations

from typing import Any, Optional

from ..registry import CODECS, DATACATALOGS, DATASETS, EVALUATORS, PIPELINES, VISIONMODELS
from .conf import Config


def create_vision_model(conf: Config) -> Any:
    arch = conf.arch
    if arch not in VISIONMODELS:
        raise KeyError(f"unknown vision model arch {arch!r}; have {sorted(VISIONMODELS)}")
    return VISIONMODELS[arch](**conf.get(arch, Config()).to_dict(resolve=True))


def create_datacatalog(conf: Config) -> Any:
    name = conf.datacatalog
    if name not in DATACATALOGS:
        raise KeyError(f"unknown datacatalog {name!r}; have {sorted(DATACATALOGS)}")
    return DATACATALOGS[name](**conf.config.to_dict(resolve=True))


def create_dataloader(conf: Config, device: str = "tpu") -> Any:
    """DataCatalog + Dataset + host-side loader (batch = list of samples).

    Ref: config/config.py:97-117 — identity collator, InferenceSampler; on TPU
    the loader stays a host-side Python iterable (no torch DataLoader).
    """
    # `dataset.registered: <name>` pulls root/annotations/type/catalog from
    # the file-backed registry (datasets/registry.py — the legacy VCM
    # dataset-management replacement)
    if conf.get("registered"):
        from ..datasets.registry import resolve_into_config

        resolve_into_config(conf)
    datacatalog = create_datacatalog(conf)
    ds_type = conf.type
    if ds_type not in DATASETS:
        raise KeyError(f"unknown dataset type {ds_type!r}; have {sorted(DATASETS)}")
    dataset = DATASETS[ds_type](
        datacatalog=datacatalog, **conf.get("settings", Config()).to_dict(resolve=True)
    )
    from ..datasets.loader import DataLoader

    return DataLoader(dataset, batch_size=conf.get("batch_size", 1))


def create_evaluator(conf: Config, datacatalog: Any = None, dataset: Any = None) -> Optional[Any]:
    """Evaluator by type; VOID/none skips evaluation (ref config.py:120-130)."""
    ev_type = conf.type
    if ev_type is None or str(ev_type).upper() in ("VOID", "NONE"):
        return None
    if ev_type not in EVALUATORS:
        raise KeyError(f"unknown evaluator {ev_type!r}; have {sorted(EVALUATORS)}")
    kwargs = conf.get("settings", Config()).to_dict(resolve=True)
    if "criteria" in conf:
        kwargs.setdefault("criteria", conf.criteria)
    return EVALUATORS[ev_type](datacatalog=datacatalog, dataset=dataset, **kwargs)


def create_pipeline(conf: Config, device: str = "tpu") -> Any:
    """Pipeline keyed `type + "-" + name`, e.g. `video-split-inference`.

    Ref: config/config.py:133-137.
    """
    key = f"{conf.type}-{conf.name}" if "name" in conf else conf.type
    if key not in PIPELINES:
        raise KeyError(f"unknown pipeline {key!r}; have {sorted(PIPELINES)}")
    return PIPELINES[key](configs=conf, device=device)


def create_codec(conf: Config, vision_model: Any = None, dataset: Any = None) -> Any:
    """Codec with vision_model + dataset injected (ref config.py:140-150)."""
    name = conf.type
    if name not in CODECS:
        raise KeyError(f"unknown codec {name!r}; have {sorted(CODECS)}")
    return CODECS[name](vision_model=vision_model, dataset=dataset, **conf.get("settings", Config()).to_dict(resolve=True))
