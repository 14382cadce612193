"""File-backed dataset registry (the FiftyOne/MongoDB replacement of the
legacy VCM CLI, ref run/vcm_app_cli/{import_custom,register,copy,show}.py)."""

import json

import numpy as np
import pytest

from lmsfc_tpu.datasets import registry


@pytest.fixture()
def reg_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LMSFC_REGISTRY", str(tmp_path / "reg.json"))
    import cv2

    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(root / "images" / f"im{i}.png"),
                    rng.integers(0, 255, (32, 48, 3)).astype(np.uint8))
    (root / "ann.json").write_text(json.dumps({
        "images": [{"id": i, "file_name": f"im{i}.png", "height": 32, "width": 48}
                   for i in range(3)],
        "annotations": [{"id": 0, "image_id": 0, "category_id": 1,
                         "bbox": [2, 2, 10, 10], "area": 100, "iscrowd": 0}],
        "categories": [{"id": 1, "name": "t"}],
    }))
    return root


class TestRegistry:
    def test_register_validates_and_counts(self, reg_env):
        entry = registry.register("a", str(reg_env), annotation_file="ann.json")
        assert entry["n_images"] == 3
        assert registry.get("a")["root"] == str(reg_env.resolve())

    def test_register_missing_images_fails(self, reg_env, tmp_path):
        with pytest.raises(FileNotFoundError):
            registry.register("bad", str(tmp_path / "nope"))

    def test_duplicate_requires_overwrite(self, reg_env):
        registry.register("a", str(reg_env))
        with pytest.raises(ValueError, match="overwrite"):
            registry.register("a", str(reg_env))
        registry.register("a", str(reg_env), overwrite=True)

    def test_copy_and_deregister(self, reg_env):
        registry.register("a", str(reg_env))
        registry.copy("a", "b")
        assert set(registry.list_datasets()) == {"a", "b"}
        registry.deregister("a")
        assert set(registry.list_datasets()) == {"b"}
        with pytest.raises(KeyError):
            registry.get("a")

    def test_resolves_into_dataloader(self, reg_env):
        """An eval config can point at the registry: dataset.registered=name
        resolves through the factory into a working dataloader."""
        import lmsfc_tpu.plugins  # noqa: F401
        from lmsfc_tpu.config import Config
        from lmsfc_tpu.config.factories import create_dataloader

        registry.register("regds", str(reg_env), annotation_file="ann.json")
        conf = Config({"registered": "regds", "batch_size": 1})
        loader = create_dataloader(conf)
        samples = [s for batch in loader for s in batch]
        assert len(samples) == 3
        assert samples[0]["org_input_size"] == {"height": 32, "width": 48}


class TestMpegToOiv6:
    def test_conversion(self, tmp_path):
        bbox = tmp_path / "bbox.csv"
        bbox.write_text(
            "ImageID,LabelName,XMin,XMax,YMin,YMax,IsGroupOf\n"
            "img1,/m/01,0.1,0.5,0.2,0.6,0\n"
            "img1,/m/02,0.0,1.0,0.0,1.0,1\n"
            "img2,/m/01,0.25,0.75,0.25,0.75,0\n"
        )
        labels = tmp_path / "labels.csv"
        labels.write_text("LabelName,DisplayName\n/m/01,person\n/m/02,crowd\n")
        out = tmp_path / "oiv6.json"
        stats = registry.convert_mpeg_to_oiv6_json(bbox, labels, out)
        assert stats == {"images": 2, "annotations": 3, "categories": 2}
        data = json.loads(out.read_text())
        assert data["annotations"][1]["isgroupof"] == 1
        assert data["categories"][0]["name"] == "person"


class TestMotImDirFallback:
    """MOT layouts declare the frame dir in seqinfo (imDir=img1); the
    catalog must honor it when imgs_folder is left at its default and
    ./images does not exist (catalogs.py BaseDataCatalog.__init__)."""

    def _mot_seq(self, tmp_path, im_dir="img1"):
        import cv2

        (tmp_path / im_dir).mkdir()
        for i in (1, 2):
            cv2.imwrite(
                str(tmp_path / im_dir / f"{i:06d}.png"),
                np.zeros((16, 24, 3), np.uint8),
            )
        (tmp_path / "seqinfo.ini").write_text(
            "[Sequence]\nname=T-01\nimDir=%s\nframeRate=30\nseqLength=2\n"
            "imWidth=24\nimHeight=16\nimExt=.png\n" % im_dir
        )
        (tmp_path / "gt").mkdir()
        (tmp_path / "gt" / "gt.txt").write_text("1,1,1,1,5,5,1,1,1\n")

    def test_imdir_from_seqinfo(self, tmp_path):
        from lmsfc_tpu.datasets.catalogs import MPEGTVDTRACKINGCatalog

        self._mot_seq(tmp_path)
        cat = MPEGTVDTRACKINGCatalog(
            root=str(tmp_path), annotation_file="gt/gt.txt", seqinfo="seqinfo.ini"
        )
        assert len(cat.image_files()) == 2

    def test_explicit_imgs_folder_wins(self, tmp_path):
        from lmsfc_tpu.datasets.catalogs import MPEGTVDTRACKINGCatalog

        self._mot_seq(tmp_path)
        cat = MPEGTVDTRACKINGCatalog(
            root=str(tmp_path), imgs_folder="img1",
            annotation_file="gt/gt.txt", seqinfo="seqinfo.ini",
        )
        assert len(cat.image_files()) == 2

    def test_existing_images_dir_preferred(self, tmp_path):
        import cv2

        from lmsfc_tpu.datasets.catalogs import MPEGTVDTRACKINGCatalog

        self._mot_seq(tmp_path)
        (tmp_path / "images").mkdir()
        cv2.imwrite(str(tmp_path / "images" / "x.png"), np.zeros((4, 4, 3), np.uint8))
        cat = MPEGTVDTRACKINGCatalog(
            root=str(tmp_path), annotation_file="gt/gt.txt", seqinfo="seqinfo.ini"
        )
        assert len(cat.image_files()) == 1
