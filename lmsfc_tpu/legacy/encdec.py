"""Legacy MPEG-VCM EncoderDecoder plugin API (image-domain).

Mirrors the fo_vcm virtual class contract (compressai_vision/pipelines/
fo_vcm/pipeline/base.py:37-116): `BGR(bgr_image, tag) -> (nbits, bgr_hat)`
with per-tag bitstream caching keyed tag+qp (ref fo_vcm/pipeline/
vtm.py:72-110), and the bpp rule bpp = sum(nbits)/sum(npix)
(ref fo_vcm/fo/predict.py:181-190). `CodecEncoderDecoder` adapts any
registered img_input-capable codec (vtm/x26x/learned image codecs) to this
legacy surface so MPEG-VCM-protocol experiments run unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


class EncoderDecoder:
    """Virtual base: subclasses implement BGR()."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._nbits_total = 0
        self._npix_total = 0

    def BGR(self, bgr_image: np.ndarray, tag: Optional[str] = None) -> Tuple[int, np.ndarray]:
        raise NotImplementedError

    def __call__(self, x: np.ndarray, tag: Optional[str] = None):
        nbits, x_hat = self.BGR(x, tag)
        return [nbits], x_hat

    @property
    def bpp(self) -> float:
        return self._nbits_total / self._npix_total if self._npix_total else float("nan")


class CodecEncoderDecoder(EncoderDecoder):
    def __init__(self, codec, cache_dir: Path = Path("./encdec_cache"), use_cache: bool = True):
        super().__init__()
        self.codec = codec
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.use_cache = use_cache

    def BGR(self, bgr_image: np.ndarray, tag: Optional[str] = None) -> Tuple[int, np.ndarray]:
        h, w = bgr_image.shape[:2]
        tag = tag or "img"
        qp = getattr(self.codec, "qp_value", "na")
        stem = f"{tag}_qp{qp}"
        bin_path = self.cache_dir / f"{stem}_bitstream.bin"

        if not (self.use_cache and bin_path.exists()):
            enc_input = {
                "file_names": [tag],
                "org_input_size": {"height": h, "width": w},
                "data": {"frames": bgr_image[None]},
            }
            self.codec.encode(
                enc_input, codec_output_dir=self.cache_dir,
                bitstream_name="bitstream", file_prefix=stem, img_input=True,
            )
        nbits = bin_path.stat().st_size * 8
        dec = self.codec.decode(
            str(bin_path), codec_output_dir=self.cache_dir,
            file_prefix=stem, img_input=True,
        )
        x_hat = np.asarray(dec["data"]["frames"][0], np.uint8)
        self._nbits_total += nbits
        self._npix_total += h * w
        return nbits, x_hat
