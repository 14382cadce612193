"""Dataset types: image folder, COCO-json detection, MOT tracking.

Mirrors compressai_vision/datasets/image.py:70-266 (DefaultDataset /
Detectron2Dataset / TrackingDataset). Samples are dicts consumed by the
vision wrappers:

  {"image_bgr": HWC uint8, "file_name": str, "image_id": int,
   "org_input_size": {"height", "width"}}

plus, for tracking, the JDE letterbox mapper output (1088x608 RGB float /255
— ref datasets/utils.py:42-94).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import cv2
import numpy as np

from ..registry import register_dataset
from .catalogs import BaseDataCatalog


@register_dataset("DefaultDataset")
class DefaultDataset:
    """Plain image-folder dataset."""

    def __init__(self, datacatalog: BaseDataCatalog, **kwargs):
        self.catalog = datacatalog
        self.files = datacatalog.image_files()
        self.thing_classes: List[str] = []

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.files[idx]
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        h, w = img.shape[:2]
        return {
            "image_bgr": img,
            "file_name": str(path),
            "image_id": idx,
            "org_input_size": {"height": h, "width": w},
        }


@register_dataset("Detectron2Dataset")
class Detectron2StyleDataset(DefaultDataset):
    """COCO-instances-json dataset with category mapping for evaluation.

    Exposes `thing_classes` + contiguous id mapping and per-image gt
    (ref datasets/image.py:192-236).
    """

    def __init__(self, datacatalog: BaseDataCatalog, **kwargs):
        self.catalog = datacatalog
        ann = datacatalog.load_annotations() or {"images": [], "annotations": [], "categories": []}
        self.coco = ann
        cats = sorted(ann.get("categories", []), key=lambda c: c["id"])
        self.thing_classes = [c["name"] for c in cats]
        self.cat_id_to_contiguous = {c["id"]: i for i, c in enumerate(cats)}
        self.images = sorted(ann.get("images", []), key=lambda im: im["id"])
        self._ann_by_image: Dict[int, List[Dict]] = {}
        for a in ann.get("annotations", []):
            self._ann_by_image.setdefault(a["image_id"], []).append(a)
        folder = datacatalog.imgs_folder
        self.files = [folder / im["file_name"] for im in self.images]

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        info = self.images[idx]
        path = self.files[idx]
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            img = np.zeros((info.get("height", 64), info.get("width", 64), 3), np.uint8)
        h, w = img.shape[:2]
        return {
            "image_bgr": img,
            "file_name": str(path),
            "image_id": info["id"],
            "org_input_size": {"height": h, "width": w},
            "annotations": self._ann_by_image.get(info["id"], []),
        }

    def gt_for_eval(self) -> Dict:
        return self.coco


@register_dataset("TrackingDataset")
class TrackingDataset(DefaultDataset):
    """JDE tracking dataset: letterboxed 1088x608 inputs + MOT gt."""

    def __init__(
        self,
        datacatalog: BaseDataCatalog,
        width: int = 1088,
        height: int = 608,
        **kwargs,
    ):
        super().__init__(datacatalog)
        self.width, self.height = width, height
        self.gt = getattr(datacatalog, "load_gt", lambda: {})()
        self.gt_ignore = getattr(datacatalog, "load_gt_ignore", lambda: {})()

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.files[idx]
        img0 = cv2.imread(str(path), cv2.IMREAD_COLOR)
        h0, w0 = img0.shape[:2]
        img, ratio, (padw, padh) = letterbox(img0, self.height, self.width)
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return {
            "image": np.transpose(rgb, (2, 0, 1)),  # CHW RGB float
            "image_bgr": img0,
            "file_name": str(path),
            "image_id": idx,
            "frame_id": idx + 1,  # MOT frames are 1-based
            "ratio": ratio,
            "pad": (padw, padh),
            "org_input_size": {"height": h0, "width": w0},
            "gt": self.gt.get(idx + 1, []),
            "gt_ignore": self.gt_ignore.get(idx + 1, []),
        }


def letterbox(
    img: np.ndarray, height: int, width: int, color=(127.5, 127.5, 127.5)
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Resize keeping aspect, pad to (height,width) — JDE convention
    (ref datasets/utils.py:42-94)."""
    shape = img.shape[:2]  # (h, w)
    ratio = min(height / shape[0], width / shape[1])
    new_unpad = (round(shape[1] * ratio), round(shape[0] * ratio))
    dw = (width - new_unpad[0]) / 2
    dh = (height - new_unpad[1]) / 2
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    resized = cv2.resize(img, new_unpad, interpolation=cv2.INTER_AREA)
    padded = cv2.copyMakeBorder(
        resized, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color
    )
    return padded, ratio, (dw, dh)
