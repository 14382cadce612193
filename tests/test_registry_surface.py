"""The public plugin surface documented in docs/migration.md must exist.

Guards two failure modes: a component module that silently stops being
imported by the plugins hub (this caught `single-input-multiple-tasks`
missing from `pipelines/__init__.py`), and the migration guide drifting
from the registries it documents.
"""

import pathlib

import lmsfc_tpu.plugins  # noqa: F401  (runs the registry decorators)
from lmsfc_tpu.registry import registers as R

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "migration.md"

EXPECTED = {
    "CODECS": {
        "bypass", "vtm", "hm", "vvenc", "x264", "x265",
        "lmsfc", "lmsfc-temporal", "mshp-image", "bmshj2018-factorized",
    },
    "PIPELINES": {
        "image-split-inference", "video-split-inference",
        "image-remote-inference", "video-remote-inference",
        "single-input-multiple-tasks",
    },
    "VISIONMODELS": {
        "faster_rcnn_R_50_FPN_3x", "mask_rcnn_R_50_FPN_3x",
        "faster_rcnn_X_101_32x8d_FPN_3x", "mask_rcnn_X_101_32x8d_FPN_3x",
        "jde_1088x608",
    },
    "EVALUATORS": {
        "COCO-EVAL", "OIC-EVAL", "MOT-EVAL", "MOT-JDE-EVAL",
        "MOT-TVD-EVAL", "MOT-HIEVE-EVAL", "YOLO-EVAL",
    },
    "DATACATALOGS": {
        "MPEGOIV6", "SFUHW", "MPEGTVDTRACKING", "MPEGHIEVE", "COCO", "IMAGES",
    },
    "DATASETS": {"DefaultDataset", "Detectron2Dataset", "TrackingDataset"},
}


def test_documented_components_are_registered():
    for family, expected in EXPECTED.items():
        registered = set(getattr(R, family))
        missing = expected - registered
        assert not missing, f"{family} missing registrations: {sorted(missing)}"


def test_fctm_gating():
    # fctm registers only when the external MPEG package is importable
    # (mirrors the reference's import-gated bridge, codecs/fctm.py)
    try:
        import fctm  # type: ignore  # noqa: F401
        assert "fctm" in R.CODECS
    except ImportError:
        assert "fctm" not in R.CODECS


def test_migration_doc_mentions_every_key():
    text = DOC.read_text()
    for family, expected in EXPECTED.items():
        for key in expected:
            assert f"`{key}`" in text, f"docs/migration.md missing `{key}` ({family})"
