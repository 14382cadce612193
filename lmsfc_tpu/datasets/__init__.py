from .catalogs import (
    COCODataCatalog,
    ImagesCatalog,
    MPEGHIEVECatalog,
    MPEGOIV6Catalog,
    MPEGTVDTRACKINGCatalog,
    SFUHWCatalog,
)
from .image import Detectron2StyleDataset, DefaultDataset, TrackingDataset
from .loader import DataLoader

__all__ = [
    "DataLoader",
    "DefaultDataset",
    "Detectron2StyleDataset",
    "TrackingDataset",
    "COCODataCatalog",
    "ImagesCatalog",
    "MPEGHIEVECatalog",
    "MPEGOIV6Catalog",
    "MPEGTVDTRACKINGCatalog",
    "SFUHWCatalog",
]
