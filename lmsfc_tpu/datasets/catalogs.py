"""Data catalogs: path/annotation/seqinfo resolution + per-catalog constants.

Mirrors compressai_vision/datasets/image.py:269-671 (DataCatalog + 6
catalogs). Catalog constants (feature dynamic ranges used for 10-bit anchor
packing) are the numeric ground truth from codecs/utils.py:30-39 and
datasets/image.py:405-558 — exact values preserved (BASELINE.md).
"""

from __future__ import annotations

import configparser
import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from ..registry import register_datacatalog

# (min, max) used for anchor-codec min-max packing — ref codecs/utils.py:30-39
MIN_MAX_DATASET: Dict[str, Tuple[float, float]] = {
    "mpeg-oiv6-detection": (-26.426828384399414, 28.397470474243164),
    "mpeg-oiv6-segmentation": (-26.426828384399414, 28.397470474243164),
    "MPEGTVDTRACKING": (-4.722218990325928, 48.58344268798828),
    "MPEGHIEVE": (-1.0795, 11.8232),
    "SFUHW": (-17.8848, 16.69417),
}


class BaseDataCatalog:
    name: str = "base"
    task: str = "detection"

    def __init__(
        self,
        root: str = ".",
        imgs_folder: str = "images",
        annotation_file: Optional[str] = None,
        seqinfo: Optional[str] = None,
        dataset_name: str = "",
        **kwargs,
    ):
        self.root = Path(root)
        self.annotation_path = (
            self.root / annotation_file if annotation_file else None
        )
        self.seqinfo_path = self.root / seqinfo if seqinfo else None
        self.dataset_name = dataset_name or self.name
        self.seq_info = self._read_seqinfo()
        # MOT layouts declare the frame dir in seqinfo (imDir=img1, ref
        # datasets/utils.py:152); honor it when imgs_folder is left at the
        # default and the default dir doesn't exist
        im_dir = self.seq_info.get("im_dir")
        if (
            imgs_folder == "images"
            and im_dir
            and not (self.root / imgs_folder).exists()
        ):
            imgs_folder = im_dir
        self.imgs_folder = self.root / imgs_folder

    def _read_seqinfo(self) -> Dict[str, Any]:
        """seqinfo.ini -> {name, fps, length, w, h} (ref datasets/utils.py:152)."""
        if self.seqinfo_path is None or not Path(self.seqinfo_path).exists():
            return {}
        cp = configparser.ConfigParser()
        cp.read(self.seqinfo_path)
        if "Sequence" not in cp:
            return {}
        s = cp["Sequence"]
        return {
            "name": s.get("name", ""),
            "fps": s.getint("frameRate", 30),
            "length": s.getint("seqLength", 0),
            "width": s.getint("imWidth", 0),
            "height": s.getint("imHeight", 0),
            "im_dir": s.get("imDir", ""),
        }

    @property
    def min_max(self) -> Optional[Tuple[float, float]]:
        return MIN_MAX_DATASET.get(self.name)

    def image_files(self) -> List[Path]:
        exts = {".png", ".jpg", ".jpeg", ".bmp"}
        if not self.imgs_folder.exists():
            return []
        return sorted(p for p in self.imgs_folder.iterdir() if p.suffix.lower() in exts)

    def load_annotations(self) -> Optional[Dict]:
        if self.annotation_path is None or not self.annotation_path.exists():
            return None
        with open(self.annotation_path) as f:
            return json.load(f)


@register_datacatalog("SFUHW")
class SFUHWCatalog(BaseDataCatalog):
    """SFU-HW-Objects video sequences, COCO-json per sequence (ref :513-558)."""

    name = "SFUHW"
    task = "detection"


@register_datacatalog("COCO")
class COCODataCatalog(BaseDataCatalog):
    name = "COCO"
    task = "detection"


@register_datacatalog("MPEGOIV6")
class MPEGOIV6Catalog(BaseDataCatalog):
    name = "mpeg-oiv6-detection"
    task = "detection"

    def __init__(self, task: str = "detection", **kwargs):
        super().__init__(**kwargs)
        self.task = task
        self.name = f"mpeg-oiv6-{task}"


@register_datacatalog("MPEGTVDTRACKING")
class MPEGTVDTRACKINGCatalog(BaseDataCatalog):
    """TVD object tracking, MOT-format gt.txt (ref :370-397)."""

    name = "MPEGTVDTRACKING"
    task = "tracking"

    def load_gt(self) -> Dict[int, List[Dict]]:
        return read_mot_gt(self.annotation_path)

    def load_gt_ignore(self) -> Dict[int, List[Dict]]:
        """Ignore-region records (ref datasets/image.py:373-383)."""
        return read_mot_gt(self.annotation_path, kind="ignore")


@register_datacatalog("MPEGHIEVE")
class MPEGHIEVECatalog(MPEGTVDTRACKINGCatalog):
    name = "MPEGHIEVE"
    task = "tracking"


@register_datacatalog("IMAGES")
class ImagesCatalog(BaseDataCatalog):
    """Annotation-free image folder (ref :616-671)."""

    name = "IMAGES"
    task = "none"


# MOT17 class semantics used by the JDE reader the reference relies on
# (jde.utils.io.read_mot_results; ref datasets/image.py:370-383):
# gt keeps mark!=0 AND class==1 (pedestrian); the ignore set is classes
# {2: person_on_vehicle, 7: static_person, 8: distractor, 12: reflection}
# or negative visibility.
MOT_VALID_CLASSES = frozenset({1})
MOT_IGNORE_CLASSES = frozenset({2, 7, 8, 12})


def read_mot_gt(path, kind: str = "gt") -> Dict[int, List[Dict]]:
    """MOT gt.txt: frame,id,x,y,w,h,conf[,cls,vis] -> per-frame records.

    kind="gt": annotated targets (mark!=0, class==1 when a class column
    exists). kind="ignore": the ignore-region records (distractor classes /
    negative visibility). Rows without a class column are all "gt"."""
    out: Dict[int, List[Dict]] = {}
    if path is None or not Path(path).exists():
        return out
    with open(path) as f:
        for line in f:
            parts = line.strip().replace(";", ",").split(",")
            if len(parts) < 6:
                continue
            frame = int(float(parts[0]))
            conf = float(parts[6]) if len(parts) > 6 else 1.0
            cls = int(float(parts[7])) if len(parts) > 7 else None
            vis = float(parts[8]) if len(parts) > 8 else 1.0
            if kind == "ignore":
                if cls is None or not (cls in MOT_IGNORE_CLASSES or vis < 0):
                    continue
            else:
                if conf == 0:
                    continue
                if cls is not None and cls not in MOT_VALID_CLASSES:
                    continue
            rec = {
                "id": int(float(parts[1])),
                "tlwh": [float(v) for v in parts[2:6]],
                "conf": conf,
                "class_id": 1 if cls is None else cls,
                "visibility": vis,
            }
            out.setdefault(frame, []).append(rec)
    return out
