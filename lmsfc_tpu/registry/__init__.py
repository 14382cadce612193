from .registers import (
    CODECS,
    DATACATALOGS,
    DATASETS,
    EVALUATORS,
    PIPELINES,
    VISIONMODELS,
    register_codec,
    register_datacatalog,
    register_dataset,
    register_evaluator,
    register_pipeline,
    register_vision_model,
)

__all__ = [
    "CODECS",
    "DATACATALOGS",
    "DATASETS",
    "EVALUATORS",
    "PIPELINES",
    "VISIONMODELS",
    "register_codec",
    "register_datacatalog",
    "register_dataset",
    "register_evaluator",
    "register_pipeline",
    "register_vision_model",
]
