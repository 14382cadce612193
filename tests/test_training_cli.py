import json

import numpy as np
import pytest

from lmsfc_tpu.config import Config
from lmsfc_tpu.run.train import train_rate_point
from lmsfc_tpu.training.data import FeatureDumpSource, SyntheticSource


class TestDataSources:
    def test_synthetic_shapes(self):
        src = iter(SyntheticSource(batch=2, base_hw=(16, 16), channels=(8, 8, 8)))
        feats = next(src)
        assert [f.shape for f in feats] == [(2, 16, 16, 8), (2, 8, 8, 8), (2, 4, 4, 8)]

    def test_feature_dump_crops(self, tmp_path):
        rng = np.random.default_rng(0)
        for i in range(2):
            np.savez(
                tmp_path / f"f{i}_features.npz",
                p2=rng.normal(size=(1, 8, 40, 56)).astype(np.float32),
                p3=rng.normal(size=(1, 8, 20, 28)).astype(np.float32),
            )
        src = iter(FeatureDumpSource(tmp_path, batch=3, base_hw=(16, 16)))
        feats = next(src)
        assert feats[0].shape == (3, 16, 16, 8)
        assert feats[1].shape == (3, 8, 8, 8)

    def test_feature_dump_pads_small_inputs(self, tmp_path):
        rng = np.random.default_rng(1)
        np.savez(
            tmp_path / "s_features.npz",
            p2=rng.normal(size=(1, 4, 10, 12)).astype(np.float32),
            p3=rng.normal(size=(1, 4, 5, 6)).astype(np.float32),
        )
        src = iter(FeatureDumpSource(tmp_path, batch=1, base_hw=(16, 16)))
        feats = next(src)
        assert feats[0].shape == (1, 16, 16, 4)


class TestTrainCLI:
    def test_train_rate_point_with_checkpoint_resume(self, tmp_path):
        conf = Config(
            {
                "training": {
                    "channels": [8, 8],
                    "num_filters": 16,
                    "latent_filters": 16,
                    "hyper_filters": 8,
                    "dtype": "float32",
                    "batch": 2,
                    "base_hw": [16, 16],
                    "steps": 6,
                    "log_every": 3,
                    "ckpt_every": 3,
                }
            }
        )
        ckpt = tmp_path / "q1"
        m1 = train_rate_point(conf, lmbda=0.05, ckpt_dir=ckpt)
        assert np.isfinite(m1["loss"])
        # resume: steps=8 continues from saved step 6
        conf.training.steps = 8
        m2 = train_rate_point(conf, lmbda=0.05, ckpt_dir=ckpt)
        assert np.isfinite(m2["loss"])
        steps = sorted(int(p.name) for p in ckpt.iterdir() if p.name.isdigit())
        assert 6 in steps and 8 in steps


class TestTrainMain:
    def test_multi_rate_main(self, tmp_path, monkeypatch):
        import json
        from lmsfc_tpu.run.train import main

        monkeypatch.chdir(tmp_path)
        main([
            "training.channels=[8,8]", "training.num_filters=16",
            "training.latent_filters=16", "training.hyper_filters=8",
            "training.dtype=float32", "training.batch=2",
            "training.base_hw=[16,16]", "training.steps=2",
            "training.log_every=1", "training.ckpt_every=2",
            "training.lmbdas=[0.0125,0.05]",
            f"training.ckpt_root={tmp_path}/ck",
        ])
        res = json.loads((tmp_path / "ck" / "train_results.json").read_text())
        assert set(res.keys()) == {"0.0125", "0.05"}
        assert (tmp_path / "ck" / "q1_lmbda0.0125").exists()
        assert (tmp_path / "ck" / "q2_lmbda0.05").exists()
