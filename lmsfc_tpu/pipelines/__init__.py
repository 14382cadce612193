from .base import BasePipeline, Parts
from .split_inference import ImageSplitInference, VideoSplitInference

__all__ = ["BasePipeline", "Parts", "ImageSplitInference", "VideoSplitInference"]
