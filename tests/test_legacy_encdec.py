import numpy as np

from lmsfc_tpu.codecs.learned_image import FactorizedImageCodec
from lmsfc_tpu.legacy import CodecEncoderDecoder


def test_legacy_bgr_api_with_cache(tmp_path):
    codec = FactorizedImageCodec(num_filters=8, latent_filters=12, dtype="float32")
    ed = CodecEncoderDecoder(codec, cache_dir=tmp_path)
    gy, gx = np.mgrid[0:32, 0:32]
    img = np.stack([(gy * 7) % 256, (gx * 4) % 256, (gy + gx) % 256], -1).astype(np.uint8)

    nbits, x_hat = ed.BGR(img, tag="t0")
    assert nbits > 0 and x_hat.shape == img.shape
    assert ed.bpp == nbits / (32 * 32)

    # second call hits the bitstream cache (same file, same bits)
    nbits2, x_hat2 = ed.BGR(img, tag="t0")
    assert nbits2 == nbits
    assert np.array_equal(x_hat, x_hat2)

    nbits_list, _ = ed(img, tag="t1")
    assert isinstance(nbits_list, list) and nbits_list[0] > 0
