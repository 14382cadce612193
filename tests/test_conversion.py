"""Round-trip tests for the raw MPEG annotation converters.

Synthesizes the raw on-disk formats (SFU-HW per-frame txt + raw YUV, TVD
9-column tracking csv + mp4-less layout), runs the converters, and loads
the results back through the same catalog/reader paths the eval pipeline
uses (`SFUHWCatalog` COCO json, `read_mot_gt`).

Raw formats per ref pipelines/fo_vcm/conversion/sfu_hw_objects_v1.py:169-209
and tvd_object_tracking_v1.py:10-88.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from lmsfc_tpu.datasets.catalogs import read_mot_gt
from lmsfc_tpu.datasets.conversion import (
    SFU_HW_CLASSMAP,
    convert_sfu_hw_objects,
    convert_tvd_tracking,
    sfu_txt_files,
)


def _make_sfu_tree(root: Path, w=64, h=32, n_frames=3):
    """ClassA/Traffic with a real raw YUV and per-frame txt annotations."""
    cls_dir = root / "ClassA"
    seq_dir = cls_dir / "Annotations" / "Traffic"
    seq_dir.mkdir(parents=True)
    yuv = cls_dir / f"Traffic_{w}x{h}_30_crop.yuv"
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    rng = np.random.default_rng(0)
    yuv.write_bytes(
        rng.integers(0, 255, n_frames * frame_bytes, dtype=np.uint8).tobytes()
    )
    # frame 0: person centered; frame 1: car near corner; frame 2: empty
    (seq_dir / "Traffic_000.txt").write_text("0 0.500000 0.500000 0.250000 0.500000\n")
    (seq_dir / "Traffic_001.txt").write_text(
        "2 0.125000 0.250000 0.250000 0.500000\n"
        "0 0.750000 0.500000 0.125000 0.250000\n"
    )
    (seq_dir / "Traffic_002.txt").write_text("")
    return seq_dir, yuv


class TestSFUHWConversion:
    def test_round_trip(self, tmp_path):
        seq_dir, _ = _make_sfu_tree(tmp_path, w=64, h=32)
        stats = convert_sfu_hw_objects(tmp_path)
        key = "ClassA_Traffic"
        assert stats[key]["frames"] == 3
        assert stats[key]["annotations"] == 3

        payload = json.loads((seq_dir / "annotations.json").read_text())
        assert [im["id"] for im in payload["images"]] == [0, 1, 2]
        assert all(im["width"] == 64 and im["height"] == 32 for im in payload["images"])

        # frame 0: center (0.5,0.5) size (0.25,0.5) at 64x32 ->
        # top-left = ((0.5-0.125)*64, (0.5-0.25)*32) = (24, 8), wh = (16, 16)
        a0 = [a for a in payload["annotations"] if a["image_id"] == 0][0]
        np.testing.assert_allclose(a0["bbox"], [24.0, 8.0, 16.0, 16.0])
        assert a0["category_id"] == 0

        # class names resolve through the MPEG-defined COCO-compatible map
        cats = {c["id"]: c["name"] for c in payload["categories"]}
        assert cats[0] == "person" and cats[2] == "car"
        assert cats == SFU_HW_CLASSMAP

    def test_frame_index_from_filename_not_order(self, tmp_path):
        seq_dir, _ = _make_sfu_tree(tmp_path)
        # add a sparse high-index frame; index must come from the name
        (seq_dir / "Traffic_010.txt").write_text("1 0.5 0.5 0.5 0.5\n")
        lis = sfu_txt_files(seq_dir)
        assert [i for i, _ in lis] == [0, 1, 2, 10]
        payload = json.loads(
            Path(convert_sfu_hw_objects(tmp_path)["ClassA_Traffic"]["json"]).read_text()
        )
        assert payload["images"][-1]["id"] == 10

    def test_unknown_class_rejected(self, tmp_path):
        seq_dir, _ = _make_sfu_tree(tmp_path)
        (seq_dir / "Traffic_000.txt").write_text("3 0.5 0.5 0.2 0.2\n")  # 3 unmapped
        with pytest.raises(ValueError, match="classmap"):
            convert_sfu_hw_objects(tmp_path)

    def test_extract_frames_from_yuv(self, tmp_path):
        seq_dir, _ = _make_sfu_tree(tmp_path, w=64, h=32, n_frames=3)
        stats = convert_sfu_hw_objects(tmp_path, extract_frames=True)
        assert stats["ClassA_Traffic"]["extracted"] == 3
        import cv2

        img = cv2.imread(str(seq_dir / "images" / "000001.png"))
        assert img is not None and img.shape == (32, 64, 3)

    def test_cli_verb(self, tmp_path):
        _make_sfu_tree(tmp_path)
        out = subprocess.run(
            [sys.executable, "-m", "lmsfc_tpu.run.cli", "convert-sfu-hw",
             str(tmp_path)],
            capture_output=True, text=True, check=True,
        )
        assert json.loads(out.stdout)["ClassA_Traffic"]["frames"] == 3


def _make_tvd_raw(root: Path):
    # raw 9-column format; frame indices restart per object id (ref :26-44)
    (root / "TVD-01.txt").write_text(
        "1,1,193,686,125,331,1,1,1\n"
        "2,1,193,686,124,330,1,1,1\n"
        "1,3,746,894,1098,106,0,9,1\n"  # conf=0 -> dropped by read_mot_gt
        "2,3,746,894,1098,106,1,9,1\n"
    )
    (root / "TVD-02.txt").write_text("1,7,10,20,30,40,1,0,0\n")


class TestTVDConversion:
    def test_round_trip(self, tmp_path):
        _make_tvd_raw(tmp_path)
        stats = convert_tvd_tracking(tmp_path)
        assert stats["TVD-01"]["frames"] == 2
        assert stats["TVD-01"]["boxes"] == 4

        gt = read_mot_gt(tmp_path / "TVD-01" / "gt" / "gt.txt")
        # frame 1 keeps only the conf!=0 row
        assert len(gt[1]) == 1 and gt[1][0]["id"] == 1
        assert gt[1][0]["tlwh"] == [193.0, 686.0, 125.0, 331.0]
        # frame 2 has both ids, sorted by (frame, id)
        assert [r["id"] for r in gt[2]] == [1, 3]
        # canonical MOT rows carry cls=1 so the pedestrian filter keeps them
        assert all(r["class_id"] == 1 for recs in gt.values() for r in recs)

    def test_seqinfo(self, tmp_path):
        import configparser

        _make_tvd_raw(tmp_path)
        convert_tvd_tracking(tmp_path, frame_rate=25)
        cp = configparser.ConfigParser()
        cp.read(tmp_path / "TVD-02" / "seqinfo.ini")
        seq = cp["Sequence"]
        assert seq["name"] == "TVD-02"
        assert int(seq["seqLength"]) == 1
        assert int(seq["frameRate"]) == 25
        assert seq["imDir"] == "img1"

    def test_staged_gt_raw_discovery(self, tmp_path):
        raw = tmp_path / "TVD-03" / "gt" / "gt_raw.txt"
        raw.parent.mkdir(parents=True)
        raw.write_text("1,1,0,0,10,10,1,1,1\n")
        stats = convert_tvd_tracking(tmp_path)
        assert stats["TVD-03"]["boxes"] == 1
        assert (tmp_path / "TVD-03" / "gt" / "gt.txt").exists()

    def test_cli_verb(self, tmp_path):
        _make_tvd_raw(tmp_path)
        out = subprocess.run(
            [sys.executable, "-m", "lmsfc_tpu.run.cli", "convert-tvd-tracking",
             str(tmp_path)],
            capture_output=True, text=True, check=True,
        )
        assert json.loads(out.stdout)["TVD-02"]["boxes"] == 1
