"""JDE weight-converter harness (VERDICT r1 #1, tracking half): a synthetic
darknet-style torch checkpoint built to the wrapper's own conv topology must
convert with every unit consumed, exact kernel transposes, and exact
BN-fold arithmetic (scale = gamma/sqrt(var+eps), bias = beta - mean*scale,
darknet eps 1e-4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lmsfc_tpu.models.wrappers.jde import JDE1088x608
from lmsfc_tpu.models.wrappers.torch_weights_jde import _BN_EPS, load_jde_weights

pytestmark = pytest.mark.slow  # e2e: skip with -m 'not slow' for a fast loop


def _conv_nodes(tree, out):
    """Collect ConvBN nodes in the converter's walk order."""
    if not isinstance(tree, dict):
        return
    keys = list(tree.keys())
    if "conv" in keys and isinstance(tree["conv"], dict) and "kernel" in tree["conv"]:
        out.append(tree)
    for k in keys:
        _conv_nodes(tree[k], out)


def test_synthetic_jde_checkpoint_roundtrip(tmp_path):
    wrapper = JDE1088x608(splits=(36, 61, 74))
    nodes = []
    _conv_nodes(wrapper._params, nodes)
    assert len(nodes) > 50  # darknet-53 + heads

    rng = np.random.default_rng(0)
    sd = {}
    expected = []
    for i, node in enumerate(nodes):
        hwio = np.asarray(node["conv"]["kernel"])
        oihw = rng.normal(0, 0.05, (hwio.shape[3], hwio.shape[2], hwio.shape[0], hwio.shape[1])).astype(np.float32)
        base = f"module_list.{i}"
        sd[f"{base}.conv.weight"] = torch.from_numpy(oihw)
        exp = {"kernel": np.transpose(oihw, (2, 3, 1, 0))}
        if "bn_scale" in node:
            c = oihw.shape[0]
            g = rng.normal(1, 0.1, c).astype(np.float32)
            b = rng.normal(0, 0.1, c).astype(np.float32)
            m = rng.normal(0, 0.1, c).astype(np.float32)
            v = rng.uniform(0.5, 2.0, c).astype(np.float32)
            sd[f"{base}.batch_norm.weight"] = torch.from_numpy(g)
            sd[f"{base}.batch_norm.bias"] = torch.from_numpy(b)
            sd[f"{base}.batch_norm.running_mean"] = torch.from_numpy(m)
            sd[f"{base}.batch_norm.running_var"] = torch.from_numpy(v)
            scale = g / np.sqrt(v + _BN_EPS)
            exp["bn_scale"] = scale
            exp["bn_bias"] = b - m * scale
        expected.append(exp)

    path = tmp_path / "synth_jde.pt"
    torch.save({"model": sd}, path)
    new_params = load_jde_weights(str(path), wrapper._params)

    got_nodes = []
    _conv_nodes(new_params, got_nodes)
    assert len(got_nodes) == len(nodes)
    for node, exp in zip(got_nodes, expected):
        np.testing.assert_array_equal(np.asarray(node["conv"]["kernel"]), exp["kernel"])
        if "bn_scale" in exp:
            np.testing.assert_allclose(
                np.asarray(node["bn_scale"]), exp["bn_scale"], rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(node["bn_bias"]), exp["bn_bias"], rtol=1e-5, atol=1e-6
            )


def test_converted_params_drive_both_halves(tmp_path):
    """Converted (synthetic) weights run NN1 -> NN2 -> tracker to finite
    outputs — the smoke the reference performs via the 54264 decode."""
    wrapper = JDE1088x608(splits=(36, 61, 74))
    nodes = []
    _conv_nodes(wrapper._params, nodes)
    rng = np.random.default_rng(1)
    sd = {}
    for i, node in enumerate(nodes):
        hwio = np.asarray(node["conv"]["kernel"])
        oihw = rng.normal(0, 0.05, (hwio.shape[3], hwio.shape[2], hwio.shape[0], hwio.shape[1])).astype(np.float32)
        base = f"module_list.{i}"
        sd[f"{base}.conv.weight"] = torch.from_numpy(oihw)
        if "bn_scale" in node:
            c = oihw.shape[0]
            for suf, val in (
                ("weight", rng.normal(1, 0.1, c)), ("bias", rng.normal(0, 0.1, c)),
                ("running_mean", rng.normal(0, 0.1, c)),
                ("running_var", rng.uniform(0.5, 2.0, c)),
            ):
                sd[f"{base}.batch_norm.{suf}"] = torch.from_numpy(val.astype(np.float32))
    path = tmp_path / "synth_jde2.pt"
    torch.save(sd, path)
    wrapper._params = load_jde_weights(str(path), wrapper._params)
    wrapper._jit_cache.clear()

    img = np.random.default_rng(2).random((3, 64, 96)).astype(np.float32)
    sample = {"image": img, "org_input_size": {"height": 64, "width": 96},
              "ratio": 1.0, "pad": (0.0, 0.0), "frame_id": 1}
    feats = wrapper.input_to_features([sample])
    for k, v in feats["data"].items():
        assert np.all(np.isfinite(np.asarray(v))), k
    out = wrapper.features_to_output(feats)
    assert isinstance(out[0], list)
