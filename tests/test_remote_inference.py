import numpy as np
import pytest

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.codecs import Bypass
from lmsfc_tpu.config import Config
from lmsfc_tpu.pipelines import ImageRemoteInference
from lmsfc_tpu.utils.color import bgr_to_yuv420, yuv420_to_bgr


class TestColor:
    def test_roundtrip_close(self):
        # smooth image: 4:2:0 subsampling error stays small (random noise
        # chroma would be destroyed by design)
        gy, gx = np.mgrid[0:32, 0:48]
        img = np.stack(
            [(gy * 8) % 256, (gx * 5) % 256, ((gx + gy) * 3) % 256], axis=-1
        ).astype(np.uint8)
        y, u, v = bgr_to_yuv420(img, 10)
        back = yuv420_to_bgr(y, u, v, 10)
        assert np.mean(np.abs(back.astype(int) - img.astype(int))) < 12

    def test_gray_exact(self):
        img = np.full((16, 16, 3), 128, np.uint8)
        y, u, v = bgr_to_yuv420(img, 10)
        back = yuv420_to_bgr(y, u, v, 10)
        assert np.max(np.abs(back.astype(int) - 128)) <= 1


class _FakeModel:
    def forward(self, samples):
        return [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "classes": np.zeros(0, np.int64)}
                for _ in samples]


class _FakeLoader:
    def __init__(self, n=2):
        rng = np.random.default_rng(1)
        self.samples = [
            {
                "image_bgr": rng.integers(0, 255, (32, 48, 3)).astype(np.uint8),
                "file_name": f"f{i}.png",
                "image_id": i,
                "org_input_size": {"height": 32, "width": 48},
            }
            for i in range(n)
        ]

    def __iter__(self):
        yield self.samples


def test_image_remote_inference_bypass(tmp_path):
    pipe = ImageRemoteInference(
        Config({"output_dir": str(tmp_path), "codec_output_dir": str(tmp_path / "c")})
    )
    codec = Bypass(eval_encode="bpp")
    timing, enc_type, coded, perf = pipe(_FakeModel(), codec, _FakeLoader(), None)
    assert enc_type == "bpp"
    # bypass image mode: bytes = H*W per frame
    assert coded["bytes"] == [32 * 48, 32 * 48]
    assert coded["total_pixels"] == 2 * 32 * 48
