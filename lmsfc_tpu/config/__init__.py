from .conf import Config, load_config
from .factories import (
    create_codec,
    create_dataloader,
    create_evaluator,
    create_pipeline,
    create_vision_model,
)

__all__ = [
    "Config",
    "load_config",
    "create_codec",
    "create_dataloader",
    "create_evaluator",
    "create_pipeline",
    "create_vision_model",
]
