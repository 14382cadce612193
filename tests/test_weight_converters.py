"""Accuracy-parity harness part 1 (VERDICT r1 #1): weight-converter audits.

Binds three artifacts together so drift in any one fails CI:
  * the torch key/shape manifest (models/wrappers/manifest.py) — the audit
    ground truth for the pinned D2 pickles (ref scripts/install.sh:103-121),
  * the converter (torch_weights.load_detectron2_weights),
  * the Flax wrappers' own init trees.

A synthetic state dict built FROM the manifest must convert into trees with
exactly the init trees' structure and shapes, then run both NN halves to
finite outputs. With a real pickle present (D2_WEIGHTS_DIR env var), the
same path loads it and the e2e forward runs — the drop-in procedure of
docs/parity.md.
"""

import os
from pathlib import Path

import jax
import numpy as np
import pytest

from lmsfc_tpu.models.wrappers.manifest import (
    audit_d2_state_dict,
    d2_torch_manifest,
    synth_d2_state_dict,
)
from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN, MaskRCNNFPN
from lmsfc_tpu.models.wrappers.torch_weights import load_detectron2_weights

pytestmark = pytest.mark.slow  # e2e: skip with -m 'not slow' for a fast loop


def _tree_spec(tree, prefix=()):
    out = {}
    for k in sorted(tree.keys()):
        v = tree[k]
        if hasattr(v, "keys"):
            out.update(_tree_spec(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def _convert_via_pickle(tmp_path, sd, **kwargs):
    import pickle

    p = tmp_path / "synth.pkl"
    with open(p, "wb") as f:
        pickle.dump({"model": sd}, f)
    return load_detectron2_weights(p, **kwargs)


CASES = [
    ("faster_r50", FasterRCNNFPN, dict(with_mask=False, depth=50)),
    ("mask_r50", MaskRCNNFPN, dict(with_mask=True, depth=50)),
]


@pytest.mark.parametrize("name,wrapper_cls,cfg", CASES, ids=[c[0] for c in CASES])
class TestConverterMatchesInitTree:
    def test_synth_roundtrip_tree_identical(self, tmp_path, name, wrapper_cls, cfg):
        manifest = d2_torch_manifest(**cfg)
        sd = synth_d2_state_dict(manifest, seed=1)
        assert audit_d2_state_dict(sd, **cfg)["ok"]

        bb, p2 = _convert_via_pickle(tmp_path, sd, **cfg)
        wrapper = wrapper_cls(resize_input=False)
        # converted trees must be drop-in replacements: same keys, shapes
        got_bb, got_p2 = _tree_spec(bb), _tree_spec(p2)
        want_bb = _tree_spec(wrapper._params_backbone)
        want_p2 = _tree_spec(wrapper._params_part2)
        assert got_bb == want_bb, set(got_bb) ^ set(want_bb)
        assert got_p2 == want_p2, set(got_p2) ^ set(want_p2)

    def test_converted_weights_run_both_halves(self, tmp_path, name, wrapper_cls, cfg):
        sd = synth_d2_state_dict(d2_torch_manifest(**cfg), seed=2)
        bb, p2 = _convert_via_pickle(tmp_path, sd, **cfg)
        wrapper = wrapper_cls(resize_input=False)
        wrapper._params_backbone, wrapper._params_part2 = bb, p2
        wrapper._jit_cache.clear()

        img = np.random.default_rng(0).integers(0, 255, (64, 96, 3)).astype(np.uint8)
        sample = {"image_bgr": img, "org_input_size": {"height": 64, "width": 96}}
        feats = wrapper.input_to_features([sample])
        for k, v in feats["data"].items():
            assert np.all(np.isfinite(np.asarray(v))), k
        preds = wrapper.features_to_output(feats)
        det = preds[0]
        assert np.all(np.isfinite(np.asarray(det["boxes"])))
        assert np.all(np.isfinite(np.asarray(det["scores"])))
        if cfg["with_mask"]:
            assert "masks_28" in det


class TestAudit:
    def test_detects_missing_key(self):
        cfg = dict(with_mask=False, depth=50)
        sd = synth_d2_state_dict(d2_torch_manifest(**cfg))
        del sd["roi_heads.box_head.fc1.weight"]
        rep = audit_d2_state_dict(sd, **cfg)
        assert not rep["ok"]
        assert rep["missing"] == ["roi_heads.box_head.fc1.weight"]

    def test_detects_shape_mismatch(self):
        cfg = dict(with_mask=False, depth=50)
        sd = synth_d2_state_dict(d2_torch_manifest(**cfg))
        sd["backbone.fpn_output3.weight"] = np.zeros((256, 256, 1, 1), np.float32)
        rep = audit_d2_state_dict(sd, **cfg)
        assert "backbone.fpn_output3.weight" in rep["shape_mismatch"]

    def test_x101_manifest_grouped_convs(self):
        """X-101-32x8d: res2 conv2 is a 32-group conv — kernel [256,8,3,3]."""
        m = d2_torch_manifest(depth=101, groups=32, width_per_group=8)
        assert m["backbone.bottom_up.res2.0.conv2.weight"] == (256, 8, 3, 3)
        assert m["backbone.bottom_up.res5.0.conv3.weight"] == (2048, 2048, 1, 1)
        # 23 res4 blocks
        assert "backbone.bottom_up.res4.22.conv1.weight" in m


@pytest.mark.skipif(
    not os.environ.get("D2_WEIGHTS_DIR")
    or not Path(os.environ.get("D2_WEIGHTS_DIR", ""), "model_final_280758.pkl").exists(),
    reason="real Detectron2 pickles not present (set D2_WEIGHTS_DIR)",
)
def test_real_pickle_audit_and_forward():
    """Weights-gated e2e check: audits the real faster_rcnn_R_50 pickle and
    runs the split halves with it (docs/parity.md drop-in procedure)."""
    path = Path(os.environ["D2_WEIGHTS_DIR"]) / "model_final_280758.pkl"
    from lmsfc_tpu.models.wrappers.manifest import audit_d2_pickle

    rep = audit_d2_pickle(path, with_mask=False, depth=50)
    assert rep["ok"], rep
    wrapper = FasterRCNNFPN(weights=str(path), resize_input=False)
    img = np.random.default_rng(0).integers(0, 255, (128, 160, 3)).astype(np.uint8)
    feats = wrapper.input_to_features(
        [{"image_bgr": img, "org_input_size": {"height": 128, "width": 160}}]
    )
    out = wrapper.features_to_output(feats)
    assert np.all(np.isfinite(np.asarray(out[0]["scores"])))
