"""Image-mode color conversion parity (VERDICT r1 weak #10).

The reference converts PNG->YUV through ffmpeg's default swscale path
(BT.601 limited range, ref codecs/std_codecs.py:292-355). utils/color.py
replaces the subprocess; these tests pin the colorimetry against ITU-R
BT.601 ANALYTIC ground truth (the spec both ffmpeg and this code target):
canonical color points land on their standard digital code values, and the
roundtrip is transparent to within quantization. swscale's fixed-point
arithmetic and chroma phase may differ by <=1 LSB at 8 bits — within the
10-bit anchor pipeline's quantization noise floor.
"""

import numpy as np
import pytest

from lmsfc_tpu.utils.color import bgr_to_yuv420, yuv420_to_bgr


def _solid(bgr, h=8, w=8):
    return np.tile(np.asarray(bgr, np.uint8), (h, w, 1))


# (BGR input, expected 8-bit (Y, U, V)) — ITU-R BT.601 digital code values
CANONICAL = [
    ((255, 255, 255), (235, 128, 128)),  # white
    ((0, 0, 0), (16, 128, 128)),         # black
    ((0, 0, 255), (81, 90, 240)),        # pure red
    ((0, 255, 0), (145, 54, 34)),        # pure green
    ((255, 0, 0), (41, 240, 110)),       # pure blue
    ((128, 128, 128), (126, 128, 128)),  # mid gray
]


@pytest.mark.parametrize("bgr,expected", CANONICAL,
                         ids=["white", "black", "red", "green", "blue", "gray"])
def test_bt601_canonical_points_8bit(bgr, expected):
    y, u, v = bgr_to_yuv420(_solid(bgr), bitdepth=8)
    got = (int(y[0, 0]), int(u[0, 0]), int(v[0, 0]))
    for g, e in zip(got, expected):
        assert abs(g - e) <= 1, f"{bgr}: got {got}, expected {expected}"


def test_10bit_is_8bit_times_4():
    """10-bit code values are the 8-bit ones shifted by 2 (±rounding)."""
    for bgr, _ in CANONICAL:
        y8, u8, v8 = bgr_to_yuv420(_solid(bgr), bitdepth=8)
        y10, u10, v10 = bgr_to_yuv420(_solid(bgr), bitdepth=10)
        assert abs(int(y10[0, 0]) - 4 * int(y8[0, 0])) <= 3
        assert abs(int(u10[0, 0]) - 4 * int(u8[0, 0])) <= 3


def test_roundtrip_transparent_10bit():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    y, u, v = bgr_to_yuv420(img, bitdepth=10)
    back = yuv420_to_bgr(y, u, v, bitdepth=10)
    # white noise is 4:2:0's worst case: per-pixel chroma is destroyed by
    # subsampling (ffmpeg's path loses the same); only bound it loosely.
    # The LUMA path must stay near-lossless even here.
    assert np.mean(np.abs(back.astype(int) - img.astype(int))) < 60
    y2, _, _ = bgr_to_yuv420(back, bitdepth=10)
    assert np.mean(np.abs(y2.astype(int) - y.astype(int))) < 4
    # smooth (gray) content roundtrips exactly
    smooth = np.tile(np.linspace(0, 255, 96).astype(np.uint8)[None, :, None], (64, 1, 3))
    y, u, v = bgr_to_yuv420(smooth, bitdepth=10)
    back = yuv420_to_bgr(y, u, v, bitdepth=10)
    assert np.max(np.abs(back.astype(int) - smooth.astype(int))) == 0
