"""Codec plugin base + bypass codec.

Mirrors the reference's pluggable encode/decode contract
(compressai_vision/codecs/base.py:39-139):

  encode(input: {"data": {tag: [N,C,H,W]}, ...}, codec_output_dir,
         bitstream_name, file_prefix, img_input=False)
      -> {"bytes": [per-frame bytes], "bitstream": path-or-passthrough}

  decode(bitstream, codec_output_dir, file_prefix, ...)
      -> {"data": {tag: [N,C,H,W]}} (or passthrough)

`Bypass` does no coding and reports fp32 raw size (4 bytes/element), with the
optional n-bit min-max quantization-noise experiment (ref base.py:89-107) —
the framework's only fault/noise-injection hook (SURVEY.md §5).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..registry import register_codec


class BaseCodec:
    def __init__(
        self,
        vision_model: Any = None,
        dataset: Any = None,
        eval_encode: str = "bpp",
        qp: Optional[int] = None,
        **kwargs,
    ):
        self.logger = logging.getLogger(self.__class__.__name__)
        self.vision_model = vision_model
        self.dataset = dataset
        self.qp = qp
        self.eval_encode = eval_encode

    @property
    def qp_value(self):
        return self.qp

    @property
    def eval_encode_type(self):
        return self.eval_encode

    def encode(self, input: Dict, codec_output_dir="", bitstream_name="", file_prefix="", img_input=False) -> Dict:
        raise NotImplementedError

    def decode(self, input, codec_output_dir="", file_prefix="", org_img_size=None, img_input=False):
        raise NotImplementedError


@register_codec("bypass")
class Bypass(BaseCodec):
    """No compression; bytes = 4 * numel (fp32 proxy); optional n-bit quant.

    With nbit_quant=n the features are min-max quantized to n bits AND the
    reported bytes become n/8 * numel — the honest storage cost of the
    n-bit fixed-point representation — so an nbit ladder (e.g. 10/8/6/4)
    is a zero-training accuracy-vs-rate anchor through the full pipeline.
    (The reference's bypass keeps the fp32 proxy under quantization; ours
    diverges deliberately so the ladder is a rate ladder, not only a noise
    experiment. Ref: compressai_vision/codecs/bypass.py.)
    """

    def __init__(self, nbit_quant: int = -1, **kwargs):
        super().__init__(**kwargs)
        self.nbit_quant = nbit_quant

    def encode(self, input: Dict, codec_output_dir="", bitstream_name="", file_prefix="", img_input=False) -> Dict:
        if img_input:
            h = input["org_input_size"]["height"]
            w = input["org_input_size"]["width"]
            return {"bytes": [h * w] * len(input["file_names"]), "bitstream": input}

        max_lvl = (2**self.nbit_quant) - 1 if self.nbit_quant != -1 else None
        total_elements = 0
        n = 1
        for tag, ft in input["data"].items():
            n = ft.shape[0]
            total_elements += math.prod(ft.shape)
            if max_lvl is not None:
                minv, maxv = ft.min(), ft.max()
                q = jnp.clip((ft - minv) / (maxv - minv), 0, 1) * max_lvl
                q = jnp.round(q) / max_lvl
                input["data"][tag] = q * (maxv - minv) + minv

        bytes_per_val = self.nbit_quant / 8 if max_lvl is not None else 4
        total_bytes = total_elements * bytes_per_val
        return {"bytes": [total_bytes / n] * n, "bitstream": input}

    def decode(self, input, codec_output_dir="", file_prefix="", org_img_size=None, img_input=False):
        return input
