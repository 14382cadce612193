from .base import BasePipeline, Parts
from .multi_task import SingleInputMultipleTasks
from .remote_inference import ImageRemoteInference, VideoRemoteInference
from .split_inference import ImageSplitInference, VideoSplitInference

__all__ = [
    "BasePipeline",
    "Parts",
    "ImageSplitInference",
    "VideoSplitInference",
    "ImageRemoteInference",
    "VideoRemoteInference",
    "SingleInputMultipleTasks",
]
