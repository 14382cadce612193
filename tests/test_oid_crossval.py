"""OID evaluator cross-validation vs the reference's vendored numpy
evaluator (VERDICT r2 item 3).

tests/fixtures/oid_crossval.json holds randomized scenarios (group-of
boxes, verified labels, near-threshold IoU matches, gt-free FP classes)
with the REFERENCE evaluator's outputs, frozen by
tests/gen_oid_crossval_fixtures.py (which imports
/root/reference/.../tf_evaluation_utils/object_detection_evaluation.py:614;
the reference is NOT imported here). lmsfc_tpu's from-scratch
evaluators/oid_challenge.py must reproduce mAP@0.5IOU on every scenario.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from lmsfc_tpu.evaluators.oid_challenge import OpenImagesChallengeEval

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "oid_crossval.json").read_text()
)

MAP_KEY = "OpenImagesDetectionChallenge_Precision/mAP@0.5IOU"


def run_ours(scenario: dict) -> float:
    ev = OpenImagesChallengeEval()
    for img in scenario["images"]:
        gt = {
            "annotations": [
                {
                    "bbox": [g["bbox_xyxy"][0], g["bbox_xyxy"][1],
                             g["bbox_xyxy"][2] - g["bbox_xyxy"][0],
                             g["bbox_xyxy"][3] - g["bbox_xyxy"][1]],
                    "category_id": g["cls"],
                    "isgroupof": g["group_of"],
                }
                for g in img["gt"]
            ],
            "org_input_size": {"height": img["h"], "width": img["w"]},
            "verified_labels": img["verified"],
        }
        pred = {
            "boxes": np.asarray([d["bbox_xyxy"] for d in img["dets"]],
                                np.float64).reshape(-1, 4),
            "classes": np.asarray([d["cls"] for d in img["dets"]], np.int64),
            "scores": np.asarray([d["score"] for d in img["dets"]], np.float64),
        }
        ev.digest(gt, pred)
    return ev.results()["mAP@0.5IOU"] / 100.0


@pytest.mark.parametrize("case", FIXTURES, ids=[f["name"] for f in FIXTURES])
def test_matches_reference(case):
    ours = run_ours(case["scenario"])
    ref = case["reference"][MAP_KEY]
    assert ours == pytest.approx(ref, abs=1e-9), (
        f"{case['name']}: ours={ours:.9f} reference={ref:.9f}"
    )
