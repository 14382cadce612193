"""Raw MPEG-distributed annotation converters (SFU-HW objects, TVD tracking).

The reference ships FiftyOne importers for the two raw annotation formats
MPEG distributes with the FCM test material:

- SFU-HW-Objects-v1 (ref pipelines/fo_vcm/conversion/sfu_hw_objects_v1.py:
  139-209): per-frame ``<seq>_NNN.txt`` files with rows
  ``class cx cy w h`` in *normalized center* coordinates, living under
  ``Class*/Annotations/<Seq>/`` next to the raw ``.yuv`` sequence.
- TVD object tracking (ref pipelines/fo_vcm/conversion/
  tvd_object_tracking_v1.py:10-88): one csv per sequence with rows
  ``frame,id,x,y,w,h,conf,3d_x,3d_y`` in absolute top-left coordinates.

This rebuild has no FiftyOne/MongoDB layer; datasets are plain directories
consumed by the catalog classes (`catalogs.py`). The converters therefore
target those on-disk layouts directly:

- SFU-HW -> per-sequence COCO-style instances json (what `SFUHWCatalog`
  loads) + optional PNG frame extraction from the raw YUV via the
  ffmpeg-free `utils.rawvideo`/`utils.color` path.
- TVD -> the MOT layout `MPEGTVDTRACKINGCatalog` reads: ``<seq>/gt/gt.txt``
  (canonical ``frame,id,x,y,w,h,conf,cls,vis`` rows), ``seqinfo.ini``, and
  optional ``img1/%06d.png`` frames extracted from the sequence mp4.

Everything is numpy/cv2 host-side IO — there is nothing device-shaped here.
"""

from __future__ import annotations

import configparser
import csv
import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

# COCO-compatible class-id table for SFU-HW-Objects-v1 — MPEG-defined
# constants (ref sfu_hw_objects_v1.py:15-37); the ids are COCO category
# indices (0-based "person"=0 etc.), the names are COCO display names.
SFU_HW_CLASSMAP: Dict[int, str] = {
    0: "person",
    1: "bicycle",
    2: "car",
    5: "bus",
    7: "truck",
    8: "boat",
    13: "bench",
    17: "horse",
    24: "backpack",
    25: "umbrella",
    26: "handbag",
    27: "tie",
    32: "sports ball",
    41: "cup",
    56: "chair",
    58: "potted plant",
    60: "dining table",
    63: "laptop",
    67: "cell phone",
    74: "clock",
    77: "teddy bear",
}

_FRAME_TXT = re.compile(r".*_(\d{3,})\.txt$")


def sfu_txt_files(seq_dir: Path) -> List[Tuple[int, Path]]:
    """Sorted (frame_index, path) for ``*_NNN.txt`` annotation files.

    Frame numbering starts at 000 and the index is taken from the filename,
    not file order (ref sfu_hw_objects_v1.py:139-166).
    """
    out = []
    for p in Path(seq_dir).glob("*.txt"):
        m = _FRAME_TXT.match(p.name)
        if m:
            out.append((int(m.group(1)), p))
    out.sort()
    return out


def _read_sfu_frame(path: Path, width: int, height: int) -> List[Dict]:
    """One ``class cx cy w h`` txt -> COCO-ish annotation dicts (abs xywh).

    Coordinates in the raw files are normalized bbox-*center* + size; COCO
    wants absolute top-left + size (center->corner shift as in ref
    sfu_hw_objects_v1.py:185-204).
    """
    anns = []
    with open(path) as f:
        for row in csv.reader(f, delimiter=" "):
            row = [c for c in row if c != ""]
            if not row:
                continue
            n_class = int(row[0])
            cx, cy, w, h = (float(v) for v in row[1:5])
            x0 = (cx - w / 2) * width
            y0 = (cy - h / 2) * height
            anns.append(
                {
                    "category_id": n_class,
                    "bbox": [x0, y0, w * width, h * height],
                    "area": w * width * h * height,
                    "iscrowd": 0,
                }
            )
    return anns


def convert_sfu_hw_objects(
    basedir: Path,
    extract_frames: bool = False,
    classmap: Optional[Dict[int, str]] = None,
) -> Dict[str, Dict]:
    """SFU-HW-Objects-v1 tree -> per-sequence COCO json (+ optional PNGs).

    Expects the MPEG layout (ref sfu_hw_objects_v1.py:213-232)::

        basedir/ClassX/<Seq>_<W>x<H>_<fps>*.yuv
        basedir/ClassX/Annotations/<Seq>/<Seq>_NNN.txt

    and writes ``annotations.json`` into each ``Annotations/<Seq>/``
    directory (the layout `SFUHWCatalog` + `Detectron2Dataset` consume:
    ``root=Annotations/<Seq>``, ``annotation_file=annotations.json``).
    With ``extract_frames=True`` the raw YUV is decoded frame-by-frame to
    ``Annotations/<Seq>/images/%06d.png`` through the ffmpeg-free
    `RawVideoSequence` + `yuv420_to_bgr` path (the reference shells out to
    ffmpeg for a lossless mp4 instead, ref :104-122).

    Returns ``{"<ClassX>_<Seq>": {"frames": n, "annotations": m, "json": path}}``.
    """
    classmap = SFU_HW_CLASSMAP if classmap is None else classmap
    from ..utils.rawvideo import get_raw_video_file_info

    basedir = Path(basedir)
    results: Dict[str, Dict] = {}
    yuvs = sorted(basedir.glob("Class*/*.yuv"))
    if not yuvs:
        raise FileNotFoundError(f"no Class*/*.yuv sequences under {basedir}")
    for yuv in yuvs:
        info = get_raw_video_file_info(yuv.stem)
        seq_dir = yuv.parent / "Annotations" / info["name"]
        if not seq_dir.is_dir():
            raise FileNotFoundError(
                f"annotation dir missing for {yuv.name}: {seq_dir}"
            )
        frames = sfu_txt_files(seq_dir)
        width, height = info["width"], info["height"]

        cat_ids = sorted(classmap)
        categories = [
            {"id": cid, "name": classmap[cid]} for cid in cat_ids
        ]
        images, annotations = [], []
        for ind, txt in frames:
            # frame index comes from the filename; file_name matches the
            # optional extraction below (and any external frame dump)
            images.append(
                {
                    "id": ind,
                    "file_name": f"{ind:06d}.png",
                    "height": height,
                    "width": width,
                }
            )
            for ann in _read_sfu_frame(txt, width, height):
                if ann["category_id"] not in classmap:
                    raise ValueError(
                        f"{txt}: class {ann['category_id']} not in the "
                        "SFU-HW classmap"
                    )
                ann["id"] = len(annotations)
                ann["image_id"] = ind
                annotations.append(ann)

        out_json = seq_dir / "annotations.json"
        out_json.write_text(
            json.dumps(
                {
                    "images": images,
                    "annotations": annotations,
                    "categories": categories,
                }
            )
        )

        n_png = 0
        if extract_frames:
            n_png = _extract_yuv_frames(
                yuv, seq_dir / "images", [i for i, _ in frames], info
            )

        key = f"{yuv.parent.name}_{info['name']}"
        results[key] = {
            "frames": len(frames),
            "annotations": len(annotations),
            "json": str(out_json),
            **({"extracted": n_png} if extract_frames else {}),
        }
    return results


def _extract_yuv_frames(
    yuv: Path, out_dir: Path, indices: List[int], info: Dict
) -> int:
    """Decode the listed frame indices of a raw 420 file to PNGs."""
    import cv2

    from ..utils.color import yuv420_to_bgr
    from ..utils.yuv import YUVReader

    out_dir.mkdir(parents=True, exist_ok=True)
    reader = YUVReader(
        yuv, info["width"], info["height"], fmt=info["format"]
    )
    n = 0
    for ind in indices:
        y, u, v = reader.read_frame(ind)
        bgr = yuv420_to_bgr(y, u, v, bitdepth=info["bitdepth"])
        cv2.imwrite(str(out_dir / f"{ind:06d}.png"), bgr)
        n += 1
    return n


# --------------------------------------------------------------------- TVD


def convert_tvd_tracking(
    dirname: Path,
    extract_frames: bool = False,
    frame_rate: int = 50,
) -> Dict[str, Dict]:
    """Raw TVD tracking csvs -> the MOT layout the TVD catalog consumes.

    Expects (ref tvd_object_tracking_v1.py:90-118)::

        dirname/TVD-01.txt   (or TVD-01/gt/gt_raw.txt)  raw 9-column csv
        dirname/TVD-01.mp4   (optional, for frame extraction + dimensions)

    and produces per sequence::

        dirname/TVD-01/gt/gt.txt      frame,id,x,y,w,h,conf,cls,vis
        dirname/TVD-01/seqinfo.ini    [Sequence] name/imDir/frameRate/...
        dirname/TVD-01/img1/%06d.png  (extract_frames=True, needs the mp4)

    The raw rows are already absolute top-left xywh; conversion is
    column-normalization: the two trailing 3D columns are dropped and the
    canonical MOT ``cls=1`` (pedestrian) + ``vis=1`` columns appended, so
    `read_mot_gt` (catalogs.py) keeps every conf!=0 row. Frame indices can
    restart per object id in the raw file (ref :26-44); rows are re-sorted
    by (frame, id).

    Returns ``{"TVD-01": {"frames": n, "boxes": m, "gt": path}}``.
    """
    dirname = Path(dirname)
    raws = _find_tvd_raw_files(dirname)
    if not raws:
        raise FileNotFoundError(
            f"no raw TVD annotation csvs (TVD-*.txt) under {dirname}"
        )
    results: Dict[str, Dict] = {}
    for tag, raw in sorted(raws.items()):
        rows = []
        with open(raw) as f:
            for line in csv.reader(f):
                if not line or len(line) < 7:
                    continue
                frame, oid = int(line[0]), int(line[1])
                x, y, w, h = (float(v) for v in line[2:6])
                conf = float(line[6])
                rows.append((frame, oid, x, y, w, h, conf))
        rows.sort(key=lambda r: (r[0], r[1]))

        seq_dir = dirname / tag
        gt_dir = seq_dir / "gt"
        gt_dir.mkdir(parents=True, exist_ok=True)
        with open(gt_dir / "gt.txt", "w") as f:
            for frame, oid, x, y, w, h, conf in rows:
                f.write(
                    f"{frame},{oid},{x:.0f},{y:.0f},{w:.0f},{h:.0f},"
                    f"{conf:.0f},1,1\n"
                )

        mp4 = dirname / f"{tag}.mp4"
        wh = _video_dims(mp4) if mp4.exists() else None
        n_frames = max((r[0] for r in rows), default=0)
        _write_seqinfo(
            seq_dir / "seqinfo.ini",
            name=tag,
            length=n_frames,
            wh=wh,
            frame_rate=frame_rate,
        )

        n_png = 0
        if extract_frames:
            if not mp4.exists():
                raise FileNotFoundError(f"frame extraction needs {mp4}")
            n_png = _extract_mp4_frames(mp4, seq_dir / "img1", n_frames)

        results[tag] = {
            "frames": n_frames,
            "boxes": len(rows),
            "gt": str(gt_dir / "gt.txt"),
            **({"extracted": n_png} if extract_frames else {}),
        }
    return results


def _find_tvd_raw_files(dirname: Path) -> Dict[str, Path]:
    """Raw csv discovery: ``TVD-xx.txt`` beside the mp4s, or a previously
    staged ``TVD-xx/gt/gt_raw.txt``."""
    raws: Dict[str, Path] = {}
    for p in dirname.glob("TVD-*.txt"):
        raws[p.stem] = p
    for p in dirname.glob("TVD-*/gt/gt_raw.txt"):
        raws.setdefault(p.parent.parent.name, p)
    return raws


def _video_dims(mp4: Path) -> Optional[Tuple[int, int]]:
    try:
        import cv2

        cap = cv2.VideoCapture(str(mp4))
        try:
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        finally:
            cap.release()
        return (w, h) if w > 0 and h > 0 else None
    except Exception:
        return None


def _write_seqinfo(
    path: Path,
    name: str,
    length: int,
    wh: Optional[Tuple[int, int]],
    frame_rate: int,
) -> None:
    cp = configparser.ConfigParser()
    cp["Sequence"] = {
        "name": name,
        "imDir": "img1",
        "frameRate": str(frame_rate),
        "seqLength": str(length),
        "imWidth": str(wh[0] if wh else 0),
        "imHeight": str(wh[1] if wh else 0),
        "imExt": ".png",
    }
    with open(path, "w") as f:
        cp.write(f)


def _extract_mp4_frames(mp4: Path, out_dir: Path, n_frames: int) -> int:
    import cv2

    out_dir.mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(mp4))
    n = 0
    try:
        while n < n_frames:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.imwrite(str(out_dir / f"{n + 1:06d}.png"), frame)
            n += 1
    finally:
        cap.release()
    return n
