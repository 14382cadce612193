"""Single-input-multiple-tasks pipeline: one bitstream, several NN2 heads."""

import numpy as np

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.codecs import Bypass
from lmsfc_tpu.config import Config
from lmsfc_tpu.pipelines.multi_task import SingleInputMultipleTasks


class _Head:
    """Fake vision model: NN1 emits one level; NN2 sums it."""

    def __init__(self, name="h"):
        self.name = name
        self.seen_tags = []

    def input_to_features(self, batch, device="cpu"):
        rng = np.random.default_rng(0)
        return {
            "data": {"p2": rng.normal(size=(1, 4, 8, 8)).astype(np.float32)},
            "org_input_size": batch[0]["org_input_size"],
        }

    def features_to_output(self, feats, device="cpu"):
        self.seen_tags = list(feats["data"].keys())
        return [{"sum": float(np.sum(list(feats["data"].values())[0]))}]


class _Eval:
    def __init__(self):
        self.digested = 0

    def digest(self, gt, pred):
        self.digested += 1

    def results(self, save_path=None):
        return {"count": self.digested}


def _loader():
    class L:
        def __iter__(self):
            yield [{"image_id": 0, "org_input_size": {"height": 32, "width": 32}}]

    return L()


def test_one_bitstream_many_heads(tmp_path):
    primary, aux = _Head("a"), _Head("b")
    ev1, ev2 = _Eval(), _Eval()
    pipe = SingleInputMultipleTasks(
        Config(
            {
                "output_dir": str(tmp_path),
                "codec_output_dir": str(tmp_path / "c"),
                "feature_maps": [{}, {"p2": "l36"}],  # second head renames levels
            }
        )
    )
    timing, enc_type, coded, performances = pipe(
        [primary, aux], Bypass(), _loader(), [ev1, ev2]
    )
    assert len(coded["bytes"]) == 1  # ONE encode for both heads
    assert ev1.digested == 1 and ev2.digested == 1
    assert performances[0]["count"] == 1 and performances[1]["count"] == 1
    assert aux.seen_tags == ["l36"]  # tag remapping applied
    assert primary.seen_tags == ["p2"]
