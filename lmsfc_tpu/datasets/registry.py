"""File-backed dataset registry — the FiftyOne/MongoDB replacement.

The reference's legacy VCM CLI manages datasets in MongoDB through FiftyOne
(ref run/vcm_app_cli/{import_custom,register,download,list,show,copy}.py,
~22 commands over a daemon). TPU-first rebuild: a plain JSON registry file
(no daemon, no service, trivially portable across hosts of a pod slice)
with the same operations. Entries resolve into the factory layer: a config
with `dataset.registered: <name>` pulls root/annotation/type/catalog from
the registry.

Registry path: $LMSFC_REGISTRY or ./datasets_registry.json.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp"}


def registry_path() -> Path:
    return Path(os.environ.get("LMSFC_REGISTRY", "./datasets_registry.json"))


def _load() -> Dict[str, Dict]:
    p = registry_path()
    if p.exists():
        return json.loads(p.read_text())
    return {}


def _save(reg: Dict[str, Dict]) -> None:
    p = registry_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(reg, indent=2, sort_keys=True))


def list_datasets() -> Dict[str, Dict]:
    return _load()


def get(name: str) -> Dict:
    reg = _load()
    if name not in reg:
        raise KeyError(
            f"dataset {name!r} not registered (have: {sorted(reg)})"
        )
    return reg[name]


def register(
    name: str,
    root: str,
    imgs_folder: str = "images",
    annotation_file: Optional[str] = None,
    dataset_type: str = "Detectron2Dataset",
    datacatalog: str = "COCO",
    overwrite: bool = False,
    **extra,
) -> Dict:
    """Validate + add an entry (ref import_custom.py/register.py)."""
    reg = _load()
    if name in reg and not overwrite:
        raise ValueError(f"dataset {name!r} already registered (use --overwrite)")
    root_p = Path(root)
    img_dir = root_p / imgs_folder
    if not img_dir.is_dir():
        raise FileNotFoundError(f"images folder missing: {img_dir}")
    n_images = sum(1 for f in img_dir.iterdir() if f.suffix.lower() in IMG_EXTS)
    if n_images == 0:
        raise ValueError(f"no images under {img_dir}")
    if annotation_file is not None and not (root_p / annotation_file).exists():
        raise FileNotFoundError(f"annotation file missing: {root_p / annotation_file}")
    entry = {
        "root": str(root_p.resolve()),
        "imgs_folder": imgs_folder,
        "annotation_file": annotation_file,
        "type": dataset_type,
        "datacatalog": datacatalog,
        "n_images": n_images,
        **extra,
    }
    reg[name] = entry
    _save(reg)
    return entry


def deregister(name: str) -> None:
    reg = _load()
    if name not in reg:
        raise KeyError(f"dataset {name!r} not registered")
    del reg[name]
    _save(reg)


def copy(src: str, dst: str) -> Dict:
    """Duplicate a registry entry under a new name (ref copy.py) —
    metadata-level copy; the underlying files are shared."""
    entry = dict(get(src))
    reg = _load()
    if dst in reg:
        raise ValueError(f"dataset {dst!r} already registered")
    reg[dst] = entry
    _save(reg)
    return entry


def resolve_into_config(dataset_conf) -> None:
    """If `dataset.registered` names a registry entry, fill dataset.type/
    datacatalog/config from it (explicit config keys win)."""
    name = dataset_conf.get("registered")
    if not name:
        return
    entry = get(name)

    def setdefault(obj, key, value):
        if obj.get(key) in (None, ""):
            obj[key] = value

    setdefault(dataset_conf, "type", entry["type"])
    setdefault(dataset_conf, "datacatalog", entry["datacatalog"])
    if dataset_conf.get("config") is None:
        dataset_conf["config"] = {}
    cfg = dataset_conf["config"]
    setdefault(cfg, "root", entry["root"])
    setdefault(cfg, "imgs_folder", entry["imgs_folder"])
    if entry.get("annotation_file"):
        setdefault(cfg, "annotation_file", entry["annotation_file"])


def convert_mpeg_to_oiv6_json(
    bbox_csv: Path, labels_csv: Path, out_json: Path, img_dir: Optional[Path] = None
) -> Dict:
    """MPEG-VCM annotation csvs -> COCO/OIV6-style instances json
    (compact port of ref run/vcm_app_cli/convert_mpeg_to_oiv6.py).

    bbox_csv columns: ImageID,LabelName,XMin,XMax,YMin,YMax[,IsGroupOf]
    (normalized coords); labels_csv: LabelName,DisplayName id map.
    """
    import csv as _csv

    label_ids: Dict[str, int] = {}
    categories = []
    with open(labels_csv) as f:
        for row in _csv.DictReader(f):
            lid = len(label_ids) + 1
            label_ids[row["LabelName"]] = lid
            categories.append({"id": lid, "name": row.get("DisplayName", row["LabelName"])})

    sizes: Dict[str, tuple] = {}
    if img_dir is not None:
        import cv2

        for p in Path(img_dir).iterdir():
            if p.suffix.lower() in IMG_EXTS:
                img = cv2.imread(str(p))
                if img is not None:
                    sizes[p.stem] = (img.shape[0], img.shape[1])

    images: Dict[str, int] = {}
    image_recs, ann_recs = [], []
    with open(bbox_csv) as f:
        for row in _csv.DictReader(f):
            img_id = row["ImageID"]
            if img_id not in images:
                h, w = sizes.get(img_id, (0, 0))
                images[img_id] = len(images)
                image_recs.append(
                    {"id": images[img_id], "file_name": f"{img_id}.jpg",
                     "height": h, "width": w}
                )
            h, w = sizes.get(img_id, (1, 1))
            x1 = float(row["XMin"]) * w
            x2 = float(row["XMax"]) * w
            y1 = float(row["YMin"]) * h
            y2 = float(row["YMax"]) * h
            ann_recs.append(
                {
                    "id": len(ann_recs),
                    "image_id": images[img_id],
                    "category_id": label_ids[row["LabelName"]],
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                    "isgroupof": int(row.get("IsGroupOf", 0) or 0),
                }
            )
    payload = {"images": image_recs, "annotations": ann_recs, "categories": categories}
    out_json.parent.mkdir(parents=True, exist_ok=True)
    out_json.write_text(json.dumps(payload))
    return {"images": len(image_recs), "annotations": len(ann_recs),
            "categories": len(categories)}
