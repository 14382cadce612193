"""Full feature workflow: generate_features_only pipeline dump -> RD training
ingestion (SURVEY.md §7 phase 4: feature-dataset ingestion reusing the
feature dumping mode of generate_features.yaml)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.config import Config
from lmsfc_tpu.models import LMSFCv2
from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN
from lmsfc_tpu.pipelines import VideoSplitInference
from lmsfc_tpu.training import create_train_state, make_train_step
from lmsfc_tpu.training.data import FeatureDumpSource


class _Loader:
    def __init__(self, n=2):
        rng = np.random.default_rng(0)
        self.samples = [
            {
                "image_bgr": rng.integers(0, 255, (64, 96, 3)).astype(np.uint8),
                "file_name": f"f{i}.png",
                "image_id": i,
                "org_input_size": {"height": 64, "width": 96},
            }
            for i in range(n)
        ]

    def __iter__(self):
        for s in self.samples:
            yield [s]


@pytest.mark.slow
def test_dump_then_train(tmp_path):
    wrapper = FasterRCNNFPN(resize_input=False)
    pipe = VideoSplitInference(
        Config(
            {
                "output_dir": str(tmp_path),
                "codec_output_dir": str(tmp_path / "c"),
                "generate_features_only": True,
                "dump_features_dir": str(tmp_path / "feats"),
            }
        )
    )

    class _NoCodec:
        eval_encode_type = "bpp"

    timing, _, coded, perf = pipe(wrapper, _NoCodec(), _Loader(), None)
    dumps = sorted((tmp_path / "feats").glob("*_features.npz"))
    assert len(dumps) == 2
    loaded = np.load(dumps[0])
    assert {"p2", "p3", "p4", "p5"} <= set(loaded.files)
    assert loaded["p2"].shape == (1, 256, 16, 24)

    # train the codec from the dumps
    src = iter(FeatureDumpSource(tmp_path / "feats", batch=2, base_hw=(16, 16)))
    feats = [jnp.asarray(f) for f in next(src)]
    assert feats[0].shape == (2, 16, 16, 256)

    model = LMSFCv2(
        out_channels=(256, 256, 256, 256), num_filters=16, latent_filters=16,
        hyper_filters=8, dtype=jnp.float32,
    )
    state = create_train_state(model, [f[:1] for f in feats])
    step = make_train_step(model, lmbda=0.05)
    state, metrics = step(state, feats, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))

    # feature-cache reuse: a second pipeline run loads from the dump
    pipe2 = VideoSplitInference(
        Config(
            {
                "output_dir": str(tmp_path / "o2"),
                "codec_output_dir": str(tmp_path / "c2"),
                "generate_features_only": True,
                "dump_features_dir": str(tmp_path / "feats"),
            }
        )
    )
    t2, *_ = pipe2(wrapper, _NoCodec(), _Loader(), None)
    # cached NN1 is much faster than computing (no jit calls at all)
    assert t2["nn-task-part1"] < timing["nn-task-part1"]
