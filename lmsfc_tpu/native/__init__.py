from .rans import RansDecoder, RansEncoder, ensure_built

__all__ = ["RansEncoder", "RansDecoder", "ensure_built"]
