from .base_wrapper import BaseWrapper
from .rcnn import FasterRCNNFPN, MaskRCNNFPN

__all__ = ["BaseWrapper", "FasterRCNNFPN", "MaskRCNNFPN"]
from .jde import JDE1088x608  # noqa: F401,E402
