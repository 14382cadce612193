"""Fixture GENERATOR for the OID evaluator cross-validation (VERDICT r2
item 3). Runs the REFERENCE's vendored numpy OID Challenge evaluator
(/root/reference/compressai_vision/evaluators/tf_evaluation_utils/
object_detection_evaluation.py:614 — numpy-only for boxes) on randomized
synthetic detection scenarios (group-of boxes, verified labels, near-0.5
IoU matches, pure-FP classes) and freezes its per-class AP + mAP@0.5IOU
into tests/fixtures/oid_crossval.json.

The committed fixture is what tests/test_oid_crossval.py compares
lmsfc_tpu's evaluators/oid_challenge.py against — the reference is only
imported HERE, never at test time.

Usage (requires the reference tree):
    python tests/gen_oid_crossval_fixtures.py
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import numpy as np

REF = Path("/root/reference/compressai_vision")


def _mount_reference():
    """Import the vendored evaluator without executing the reference's
    heavy package __init__ (torchvision) or the mask utils (pycocotools)."""
    pkg = types.ModuleType("compressai_vision")
    pkg.__path__ = [str(REF)]
    ev = types.ModuleType("compressai_vision.evaluators")
    ev.__path__ = [str(REF / "evaluators")]
    tfe = types.ModuleType("compressai_vision.evaluators.tf_evaluation_utils")
    tfe.__path__ = [str(REF / "evaluators" / "tf_evaluation_utils")]
    sys.modules.setdefault("compressai_vision", pkg)
    sys.modules.setdefault("compressai_vision.evaluators", ev)
    sys.modules.setdefault("compressai_vision.evaluators.tf_evaluation_utils", tfe)
    from compressai_vision.evaluators.tf_evaluation_utils import (  # noqa: E501
        object_detection_evaluation as ode,
        standard_fields as sf,
    )

    return ode, sf


def make_scenario(rng: np.random.Generator, n_images: int, n_classes: int,
                  with_groups: bool, with_verified: bool) -> dict:
    """Random scenario in ABSOLUTE pixel coords (xyxy), image size 400x600."""
    H, W = 400, 600
    images = []
    for img_i in range(n_images):
        n_gt = int(rng.integers(1, 6))
        gt = []
        for _ in range(n_gt):
            x0, y0 = rng.uniform(0, W - 80), rng.uniform(0, H - 80)
            w, h = rng.uniform(40, 160), rng.uniform(40, 120)
            gt.append({
                "bbox_xyxy": [x0, y0, min(x0 + w, W), min(y0 + h, H)],
                "cls": int(rng.integers(1, n_classes + 1)),
                "group_of": int(with_groups and rng.random() < 0.3),
            })
        dets = []
        # near-matches of gt boxes (jittered, IoU scattered around 0.3-0.9)
        for g in gt:
            for _ in range(int(rng.integers(0, 3))):
                b = np.asarray(g["bbox_xyxy"], float)
                jit = rng.normal(0, 18, 4)
                bb = [min(max(b[0] + jit[0], 0), W - 2), min(max(b[1] + jit[1], 0), H - 2),
                      None, None]
                bb[2] = min(max(b[2] + jit[2], bb[0] + 2), W)
                bb[3] = min(max(b[3] + jit[3], bb[1] + 2), H)
                cls = g["cls"] if rng.random() < 0.8 else int(rng.integers(1, n_classes + 1))
                dets.append({"bbox_xyxy": [float(v) for v in bb], "cls": cls,
                             "score": float(rng.uniform(0.05, 0.99))})
        # random false positives (incl. classes with no gt anywhere)
        for _ in range(int(rng.integers(0, 4))):
            x0, y0 = rng.uniform(0, W - 60), rng.uniform(0, H - 60)
            dets.append({
                "bbox_xyxy": [x0, y0, x0 + rng.uniform(20, 120), y0 + rng.uniform(20, 120)],
                "cls": int(rng.integers(1, n_classes + 2)),  # may exceed gt classes
                "score": float(rng.uniform(0.05, 0.99)),
            })
        gt_classes = sorted({g["cls"] for g in gt})
        if with_verified:
            # verified = all gt classes + sometimes an extra verified-empty
            # class (its detections are FPs) ; detections of classes NOT
            # verified must be ignored
            verified = list(gt_classes)
            if rng.random() < 0.5:
                extra = int(rng.integers(1, n_classes + 2))
                if extra not in verified:
                    verified.append(extra)
        else:
            verified = list(range(1, n_classes + 2))  # everything evaluatable
        images.append({"image_id": f"im{img_i}", "h": H, "w": W, "gt": gt,
                       "dets": dets, "verified": sorted(verified)})
    return {"n_classes": n_classes, "images": images}


def reference_eval(scenario: dict) -> dict:
    ode, sf = _mount_reference()
    n_cls = scenario["n_classes"]
    categories = [{"id": c, "name": f"c{c}"} for c in range(1, n_cls + 2)]
    ev = ode.OpenImagesChallengeEvaluator(categories, evaluate_masks=False)
    In, Det = sf.InputDataFields, sf.DetectionResultFields
    for img in scenario["images"]:
        H, W = img["h"], img["w"]
        boxes = np.asarray(
            [[g["bbox_xyxy"][1] / H, g["bbox_xyxy"][0] / W,
              g["bbox_xyxy"][3] / H, g["bbox_xyxy"][2] / W] for g in img["gt"]],
            float,
        ).reshape(-1, 4)
        ev.add_single_ground_truth_image_info(img["image_id"], {
            In.groundtruth_boxes: boxes,
            In.groundtruth_classes: np.asarray([g["cls"] for g in img["gt"]], int),
            In.groundtruth_group_of: np.asarray(
                [g["group_of"] for g in img["gt"]], bool),
            In.groundtruth_image_classes: np.asarray(img["verified"], int),
        })
    for img in scenario["images"]:
        H, W = img["h"], img["w"]
        dboxes = np.asarray(
            [[d["bbox_xyxy"][1] / H, d["bbox_xyxy"][0] / W,
              d["bbox_xyxy"][3] / H, d["bbox_xyxy"][2] / W] for d in img["dets"]],
            float,
        ).reshape(-1, 4)
        ev.add_single_detected_image_info(img["image_id"], {
            Det.detection_boxes: dboxes,
            Det.detection_classes: np.asarray([d["cls"] for d in img["dets"]], int),
            Det.detection_scores: np.asarray([d["score"] for d in img["dets"]], float),
        })
    out = ev.evaluate()
    result = {}
    for k, v in out.items():
        if np.isscalar(v) or getattr(v, "ndim", 1) == 0:
            result[k] = float(v)
    return result


def main() -> None:
    rng = np.random.default_rng(20260817)
    cases = [
        ("plain", dict(n_images=4, n_classes=3, with_groups=False, with_verified=False)),
        ("group_of", dict(n_images=5, n_classes=3, with_groups=True, with_verified=False)),
        ("verified", dict(n_images=5, n_classes=4, with_groups=False, with_verified=True)),
        ("group_verified", dict(n_images=6, n_classes=4, with_groups=True, with_verified=True)),
        ("dense", dict(n_images=10, n_classes=5, with_groups=True, with_verified=True)),
    ]
    fixtures = []
    for name, kw in cases:
        sc = make_scenario(rng, **kw)
        ref = reference_eval(sc)
        print(name, {k: round(v, 6) for k, v in ref.items() if "mAP" in k})
        fixtures.append({"name": name, "scenario": sc, "reference": ref})
    out = Path(__file__).parent / "fixtures" / "oid_crossval.json"
    out.write_text(json.dumps(fixtures, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
