import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.evaluators.oid_challenge import OpenImagesChallengeEval
from lmsfc_tpu.utils.rawvideo import RawVideoSequence, get_raw_video_file_info


class TestOIDEval:
    def _img(self, gts, dets, verified=None):
        gt = {
            "annotations": [
                {"bbox": b, "category_id": c, "isgroupof": g} for b, c, g in gts
            ],
            "verified_labels": verified,
        }
        pred = {
            "boxes": np.asarray([d[0] for d in dets], np.float64).reshape(-1, 4),
            "classes": np.asarray([d[1] for d in dets], np.int64),
            "scores": np.asarray([d[2] for d in dets], np.float64),
        }
        return gt, pred

    def test_perfect_detection(self):
        ev = OpenImagesChallengeEval()
        gt, pred = self._img(
            gts=[([10, 10, 20, 20], 0, 0)],
            dets=[([10, 10, 30, 30], 0, 0.9)],
        )
        ev.digest(gt, pred)
        res = ev.results()
        assert res["mAP@0.5IOU"] == pytest.approx(100.0)

    def test_false_positive_lowers_ap(self):
        ev = OpenImagesChallengeEval()
        gt, pred = self._img(
            gts=[([10, 10, 20, 20], 0, 0)],
            dets=[
                ([10, 10, 30, 30], 0, 0.8),
                ([100, 100, 40, 40], 0, 0.9),  # FP, higher score
            ],
        )
        ev.digest(gt, pred)
        res = ev.results()
        assert res["mAP@0.5IOU"] == pytest.approx(50.0)

    def test_group_of_ignored_extras(self):
        ev = OpenImagesChallengeEval()
        # one group-of gt; two dets inside it -> 1 TP, second ignored
        gt, pred = self._img(
            gts=[([0, 0, 100, 100], 0, 1)],
            dets=[
                ([10, 10, 20, 20], 0, 0.9),
                ([50, 50, 20, 20], 0, 0.8),
            ],
        )
        ev.digest(gt, pred)
        res = ev.results()
        assert res["mAP@0.5IOU"] == pytest.approx(100.0)

    def test_unverified_class_ignored(self):
        ev = OpenImagesChallengeEval()
        gt, pred = self._img(
            gts=[([10, 10, 20, 20], 0, 0)],
            dets=[([10, 10, 30, 30], 0, 0.9)],
            verified=[0],
        )
        ev.digest(gt, pred)
        # second image verified only for class 1: class-0 detections ignored
        gt2, pred2 = self._img(
            gts=[([10, 10, 20, 20], 1, 0)],
            dets=[([200, 200, 50, 50], 0, 0.99), ([10, 10, 30, 30], 1, 0.9)],
            verified=[1],
        )
        ev.digest(gt2, pred2)
        res = ev.results()
        assert res["mAP@0.5IOU"] == pytest.approx(100.0)


class TestRawVideo:
    def test_filename_parsing(self):
        info = get_raw_video_file_info("Traffic_2560x1600_30_10bit")
        assert info["width"] == 2560 and info["height"] == 1600
        assert info["fps"] == 30 and info["bitdepth"] == 10
        assert info["format"] == "yuv420_10le"

    def test_mmap_sequence(self, tmp_path):
        w, h = 16, 8
        frames = np.arange(2 * w * h, dtype=np.uint8).reshape(2, h, w)
        path = tmp_path / "seq_16x8_30.yuv"
        raw = bytearray()
        for f in frames:
            raw += f.tobytes() + bytes((w // 2) * (h // 2) * 2)  # chroma filler
        path.write_bytes(bytes(raw))
        seq = RawVideoSequence(path)
        assert len(seq) == 2
        assert np.array_equal(seq[1], frames[1])


class TestAccuracyProxy:
    @pytest.mark.slow
    def test_proxy_maps_and_training_hook(self):
        from lmsfc_tpu.models.wrappers.rcnn import FasterRCNNFPN
        from lmsfc_tpu.models import LMSFCv2
        from lmsfc_tpu.training import create_train_state, make_train_step

        wrapper = FasterRCNNFPN()
        rng = np.random.default_rng(0)
        data = {
            f"p{i+2}": rng.normal(size=(1, 256, 16 // 2**i, 16 // 2**i)).astype(np.float32)
            for i in range(4)
        }
        maps = wrapper.deeper_features_for_accuracy_proxy({"data": data})
        assert len(maps) == 5  # p2..p6
        assert maps[0].shape[-1] == 3 * 5  # A*(1+4)

        model = LMSFCv2(
            out_channels=(256,) * 4, num_filters=16, latent_filters=16,
            hyper_filters=8, dtype=jnp.float32,
        )
        feats = [
            jnp.asarray(rng.normal(size=(1, 16 // 2**i, 16 // 2**i, 256)).astype(np.float32))
            for i in range(4)
        ]
        state = create_train_state(model, feats)
        step = make_train_step(
            model, lmbda=0.05, proxy_fn=wrapper.proxy_fn(), proxy_weight=1.0
        )
        state, metrics = step(state, feats, jax.random.key(0))
        assert "proxy" in metrics and np.isfinite(float(metrics["proxy"]))
