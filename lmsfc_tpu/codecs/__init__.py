from .base import BaseCodec, Bypass
from .learned import LMSFCCodec

__all__ = ["BaseCodec", "Bypass", "LMSFCCodec"]
