from .lmsfc import DRNet, FENet, LMSFCv2

__all__ = ["FENet", "DRNet", "LMSFCv2"]
