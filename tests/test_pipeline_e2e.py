"""End-to-end split-inference: synthetic COCO dataset -> NN1 -> codec -> NN2
-> evaluator -> summary.csv. The 'minimum end-to-end slice' of SURVEY.md §7
phase 2, with both the bypass and the learned lmsfc codec."""

import json

import numpy as np
import pytest

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.config import Config
from lmsfc_tpu.run.eval_split_inference import run

pytestmark = pytest.mark.slow  # e2e: skip with -m 'not slow' for a fast loop


@pytest.fixture(scope="module")
def tiny_coco_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    import cv2

    images, annotations = [], []
    for i in range(3):
        img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        name = f"im_{i}.png"
        cv2.imwrite(str(img_dir / name), img)
        images.append({"id": i, "file_name": name, "height": 64, "width": 96})
        annotations.append(
            {
                "id": i * 2,
                "image_id": i,
                "category_id": 1,
                "bbox": [10, 10, 30, 20],
                "area": 600,
                "iscrowd": 0,
            }
        )
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }
    with open(root / "ann.json", "w") as f:
        json.dump(coco, f)
    return root


def _conf(root, out_dir, codec_type="bypass", codec_settings=None):
    return Config(
        {
            "misc": {"device": "cpu", "overwrite_results": True},
            "vision_model": {
                "arch": "faster_rcnn_R_50_FPN_3x",
                "faster_rcnn_R_50_FPN_3x": {"resize_input": False},
            },
            "dataset": {
                "type": "Detectron2Dataset",
                "datacatalog": "COCO",
                "config": {
                    "root": str(root),
                    "imgs_folder": "images",
                    "annotation_file": "ann.json",
                },
                "batch_size": 1,
            },
            "evaluator": {"type": "COCO-EVAL", "criteria": "AP"},
            "pipeline": {
                "type": "image",
                "name": "split-inference",
                "output_dir": str(out_dir),
                "codec_output_dir": str(out_dir / "codec"),
            },
            "codec": {"type": codec_type, "settings": codec_settings or {}},
        }
    )


def test_e2e_bypass(tiny_coco_dataset, tmp_path):
    out = run(_conf(tiny_coco_dataset, tmp_path / "run1"))
    s = out["summary"]
    assert (tmp_path / "run1" / "summary.csv").exists()
    assert s["bpp"] > 0
    # bypass bpp = 4 bytes/elem * total elems * 8 / pixels; p2..p5 of 64x96
    assert np.isfinite(s["bpp"])
    assert "AP" in out["performance"]


def test_e2e_lmsfc(tiny_coco_dataset, tmp_path):
    out = run(
        _conf(
            tiny_coco_dataset,
            tmp_path / "run2",
            codec_type="lmsfc",
            codec_settings={
                "num_filters": 16,
                "latent_filters": 16,
                "hyper_filters": 8,
                "dtype": "float32",
            },
        )
    )
    s = out["summary"]
    assert s["bpp"] > 0
    # learned codec must beat raw fp32 features by a large margin
    raw_bpp = 256 * 4 * 8 * (1 / 16 + 1 / 64 + 1 / 256 + 1 / 1024)
    assert s["bpp"] < raw_bpp / 10
    bin_files = list((tmp_path / "run2" / "codec").glob("*.bin"))
    assert len(bin_files) == 3  # one bitstream per image


def test_video_f16_feature_buffer(tiny_coco_dataset, tmp_path):
    """feature_buffer_dtype=float16 halves the host buffer; the learned
    codec output must stay within the f16-quantization envelope of the f32
    run (bpp nearly unchanged, pipeline green end-to-end)."""
    def conf(out, dtype):
        c = _conf(
            tiny_coco_dataset, out, codec_type="lmsfc",
            codec_settings={"num_filters": 16, "latent_filters": 16,
                            "hyper_filters": 8, "dtype": "float32"},
        )
        c["pipeline"]["type"] = "video"
        c["pipeline"]["feature_buffer_dtype"] = dtype
        return c

    out32 = run(conf(tmp_path / "v32", "float32"))
    out16 = run(conf(tmp_path / "v16", "float16"))
    assert out16["summary"]["bpp"] > 0
    assert out16["summary"]["bpp"] == pytest.approx(out32["summary"]["bpp"], rel=0.02)


def test_encode_only_then_decode_only(tiny_coco_dataset, tmp_path):
    """Staged restartability: encode_only writes bitstreams; a separate
    decode_only run consumes them (ref SURVEY.md §5 coarse restartability)."""
    out_dir = tmp_path / "staged"
    conf = _conf(
        tiny_coco_dataset, out_dir, codec_type="lmsfc",
        codec_settings={"num_filters": 16, "latent_filters": 16,
                        "hyper_filters": 8, "dtype": "float32", "seed": 7},
    )
    conf.pipeline.encode_only = True
    run(conf)
    bins = list((out_dir / "codec").glob("img_id_*_bitstream.bin"))
    assert len(bins) == 3
    assert not any("AP" in str(p) for p in out_dir.iterdir())

    conf2 = _conf(
        tiny_coco_dataset, out_dir, codec_type="lmsfc",
        codec_settings={"num_filters": 16, "latent_filters": 16,
                        "hyper_filters": 8, "dtype": "float32", "seed": 7},
    )
    conf2.pipeline.decode_only = True
    out = run(conf2)
    assert "AP" in out["performance"]
    assert out["summary"]["bpp"] > 0
