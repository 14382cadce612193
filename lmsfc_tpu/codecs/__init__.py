from .base import BaseCodec, Bypass
from .learned import LMSFCCodec

__all__ = ["BaseCodec", "Bypass", "LMSFCCodec"]
from .std_codecs import HM, VTM, VVENC  # noqa: F401,E402
from .ffmpeg import X264, X265  # noqa: F401,E402
from .learned_image import FactorizedImageCodec, HyperpriorImageCodec  # noqa: F401,E402
from .learned_temporal import LMSFCTemporalCodec  # noqa: F401,E402
