from .base_wrapper import BaseWrapper
from .rcnn import FasterRCNNFPN, MaskRCNNFPN

__all__ = ["BaseWrapper", "FasterRCNNFPN", "MaskRCNNFPN"]
