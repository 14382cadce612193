import numpy as np
import pytest

import lmsfc_tpu.plugins  # noqa: F401
from lmsfc_tpu.codecs.learned_image import FactorizedImageCodec, HyperpriorImageCodec


def _frames(n=2, h=32, w=48, seed=0):
    gy, gx = np.mgrid[0:h, 0:w]
    base = np.stack([(gy * 5) % 256, (gx * 3) % 256, ((gx + gy) * 2) % 256], -1)
    return np.stack([np.roll(base, i * 3, axis=1) for i in range(n)]).astype(np.uint8)


@pytest.mark.parametrize("cls,kw", [
    (FactorizedImageCodec, {}),
    (HyperpriorImageCodec, {}),
])
@pytest.mark.slow
def test_image_codec_roundtrip(cls, kw, tmp_path):
    codec = cls(num_filters=8, latent_filters=12, dtype="float32", **kw)
    frames = _frames()
    out = codec.encode(
        {"data": {"frames": frames}, "file_names": ["a", "b"],
         "org_input_size": {"height": 32, "width": 48}},
        tmp_path, "img", img_input=True,
    )
    assert len(out["bytes"]) == 2 and all(b > 0 for b in out["bytes"])
    dec = codec.decode(out["bitstream"], tmp_path, img_input=True)
    rec = dec["data"]["frames"]
    assert rec.shape == frames.shape and rec.dtype == np.uint8
    # decoding twice is deterministic
    dec2 = codec.decode(out["bitstream"], tmp_path, img_input=True)
    assert np.array_equal(rec, dec2["data"]["frames"])


def test_image_codec_with_remote_pipeline(tmp_path):
    from lmsfc_tpu.config import Config
    from lmsfc_tpu.pipelines import ImageRemoteInference
    from tests.test_remote_inference import _FakeLoader, _FakeModel

    codec = FactorizedImageCodec(num_filters=8, latent_filters=12, dtype="float32")
    pipe = ImageRemoteInference(
        Config({"output_dir": str(tmp_path), "codec_output_dir": str(tmp_path / "c")})
    )
    timing, enc_type, coded, perf = pipe(_FakeModel(), codec, _FakeLoader(), None)
    assert all(b > 0 for b in coded["bytes"])
