"""Learned image-codec plugins for the remote-inference (image-domain) path.

The TPU realization of the legacy CompressAIEncoderDecoder surface
(ref pipelines/fo_vcm/pipeline/compressai.py:47-161: net.compress ->
strings+shape, net.decompress -> x_hat), as registry codecs operating in
img_input mode: frames [N,H,W,3] uint8 -> [0,1] floats -> analysis ->
rANS bitstream -> synthesis -> reconstructed frames.

Bitstream: 'LMI1' | model-id u8 | n_frames u32 | H u32 | W u32 |
per frame: [z_len u32 z_bytes] y_len u32 y_bytes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.entropy_bottleneck import build_eb_cdf_table, eb_build_indexes
from ..entropy.gaussian_conditional import GaussianConditional
from ..models.image_codec import FactorizedPrior, MeanScaleHyperprior
from ..native import RansDecoder, RansEncoder
from ..registry import register_codec
from ..utils.readwrite import read_bytes, read_uchars, read_uints, write_bytes, write_uchars, write_uints

# LMI2: rANS payloads are 4-way interleaved (native/rans.cpp); LMI1 used
# the single-stream CompressAI-compatible layout
_MAGIC = b"LMI2"
_RANS_STREAMS = 4


class _LearnedImageCodec:
    model_id = 0
    has_hyper = False

    def __init__(
        self,
        vision_model=None,
        dataset=None,
        eval_encode: str = "bpp",
        qp: Optional[int] = None,
        quality: int = 1,
        num_filters: int = 128,
        latent_filters: int = 192,
        checkpoint_dir: Optional[str] = None,
        params: Optional[Dict] = None,
        dtype: str = "bfloat16",
        seed: int = 0,
        **kwargs,
    ):
        import logging

        self.logger = logging.getLogger(self.__class__.__name__)
        self.qp = qp if qp is not None else quality
        self.eval_encode = eval_encode
        self.model = self._build(num_filters, latent_filters, dtype)
        self._params = params
        self._params_on_device = False
        self._checkpoint_dir = checkpoint_dir
        self._seed = seed
        self._gaussian = GaussianConditional()
        self._tables_cache = None
        self._enc = RansEncoder(streams=_RANS_STREAMS)
        self._dec = RansDecoder(streams=_RANS_STREAMS)
        self._jit: Dict = {}

    def _build(self, n, m, dtype):
        raise NotImplementedError

    @property
    def qp_value(self):
        return self.qp

    @property
    def eval_encode_type(self):
        return self.eval_encode

    @property
    def params(self):
        if self._params is None:
            if self._checkpoint_dir:
                from ..training.checkpoint import CheckpointManager

                restored = CheckpointManager(Path(self._checkpoint_dir)).restore()
                if restored is not None:
                    self._params = restored["params"]
            if self._params is None:
                self.logger.warning("no checkpoint; random image-codec params")
                x = jnp.zeros((1, 64, 64, 3), jnp.float32)
                self._params = self.model.init(
                    {"params": jax.random.key(self._seed), "noise": jax.random.key(1)}, x
                )["params"]
        if not self._params_on_device:
            from ..utils.tree import device_pin

            # pin once: host numpy trees re-upload per jit call (utils/tree.py)
            self._params = device_pin(self._params)
            self._params_on_device = True
        return self._params

    def _tables(self):
        if self._tables_cache is None:
            eb = build_eb_cdf_table(
                jax.tree_util.tree_map(np.asarray, self.params["entropy_bottleneck"])
            )
            medians = np.asarray(self.params["entropy_bottleneck"]["quantiles"])[:, 0, 1]
            gc = self._gaussian.cdf_table()
            self._tables_cache = (eb, medians, gc)
        return self._tables_cache

    def _fn(self, name, make):
        if name not in self._jit:
            self._jit[name] = jax.jit(make())
        return self._jit[name]

    # ---------------------------------------------------------------- encode
    def encode(self, input: Dict, codec_output_dir="", bitstream_name="bitstream",
               file_prefix="", img_input=True) -> Dict:
        assert img_input, "learned image codecs are image-domain (remote inference)"
        frames = np.asarray(input["data"]["frames"])  # [N,H,W,3] uint8 BGR
        n, h, w = frames.shape[:3]
        x = jnp.asarray(frames.astype(np.float32) / 255.0)

        out_dir = Path(codec_output_dir) if codec_output_dir else Path(".")
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = f"{file_prefix}_" if file_prefix else ""
        path = out_dir / f"{stem}{bitstream_name}.bin"

        with open(path, "wb") as fd:
            fd.write(_MAGIC)
            write_uchars(fd, (self.model_id,))
            write_uints(fd, (n, h, w))
            for i in range(n):
                self._encode_frame(fd, x[i : i + 1])
        total = path.stat().st_size
        return {"bytes": [total / n] * n, "bitstream": str(path)}

    def decode(self, input, codec_output_dir="", file_prefix="", org_img_size=None,
               img_input=True) -> Dict:
        path = Path(input if isinstance(input, (str, Path)) else input["bitstream"])
        with open(path, "rb") as fd:
            assert fd.read(4) == _MAGIC
            (mid,) = read_uchars(fd, 1)
            assert mid == self.model_id, "bitstream coded with another model"
            n, h, w = read_uints(fd, 3)
            frames = [self._decode_frame(fd, h, w) for _ in range(n)]
        arr = np.clip(np.concatenate(frames) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return {"data": {"frames": arr}}


@register_codec("bmshj2018-factorized")
class FactorizedImageCodec(_LearnedImageCodec):
    model_id = 1

    def _build(self, n, m, dtype):
        return FactorizedPrior(
            num_filters=n, latent_filters=m,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        )

    def _encode_frame(self, fd, x):
        # analysis + quantization in ONE device program: only i16 symbols
        # cross the wire (same discipline as codecs/learned.py)
        analysis = self._fn(
            ("a", x.shape),
            lambda: lambda p, xx: jnp.clip(
                jnp.round(
                    self.model.apply({"params": p}, xx, method=FactorizedPrior.analysis)
                    - p["entropy_bottleneck"]["quantiles"][None, None, None, :, 0, 1]
                ),
                -32768, 32767,
            ).astype(jnp.int16),
        )
        sym = np.asarray(analysis(self.params, x))
        eb, medians, _ = self._tables()
        idx = eb_build_indexes(sym.shape[1:], sym.shape[-1])
        bs = self._enc.encode_with_indexes(
            sym.ravel(), idx.ravel(), eb.cdfs, eb.cdf_lengths, eb.offsets
        )
        write_uints(fd, (sym.shape[1], sym.shape[2], len(bs)))
        write_bytes(fd, bs)

    def _decode_frame(self, fd, h, w):
        yh, yw, blen = read_uints(fd, 3)
        bs = read_bytes(fd, blen)
        eb, medians, _ = self._tables()
        c = self.model.latent_filters
        idx = eb_build_indexes((yh, yw, c), c)
        sym = self._dec.decode_with_indexes(bs, idx.ravel(), eb.cdfs, eb.cdf_lengths, eb.offsets)
        y_hat = sym.reshape(1, yh, yw, c).astype(np.float32) + medians[None, None, None, :]
        synthesis = self._fn(
            ("s", (yh, yw, h, w)),
            lambda: lambda p, yy: self.model.apply(
                {"params": p}, yy, (h, w), method=FactorizedPrior.synthesis
            ),
        )
        return np.asarray(synthesis(self.params, jnp.asarray(y_hat)), np.float32)


@register_codec("mshp-image")
class HyperpriorImageCodec(_LearnedImageCodec):
    """Mean-scale hyperprior image codec (bmshj2018-hyperprior class)."""

    model_id = 2
    has_hyper = True

    def _build(self, n, m, dtype):
        return MeanScaleHyperprior(
            num_filters=n, latent_filters=m,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        )

    def _hs_idx_fn(self, z_shape, y_hw):
        """fn(params, z_sym i16) -> (y_idx u8, means) — THE shared program
        both sides derive coding state from (see codecs/learned.py)."""
        m = self.model

        def make():
            def fn(p, z_sym):
                medians = p["entropy_bottleneck"]["quantiles"][:, 0, 1]
                z_hat = z_sym.astype(jnp.float32) + medians[None, None, None, :]
                scales, means = m.apply(
                    {"params": p}, z_hat, y_hw,
                    method=MeanScaleHyperprior.hyper_synthesis,
                )
                return GaussianConditional.build_indexes_device(scales), means

            return fn

        return self._fn(("hsidx", z_shape, y_hw), make)

    def _encode_frame(self, fd, x):
        m = self.model
        # one device program: analysis, hyper-analysis, z quantization
        enc = self._fn(
            ("a", x.shape),
            lambda: lambda p, xx: (
                lambda y: (
                    y,
                    jnp.clip(
                        jnp.round(
                            m.apply({"params": p}, y, method=MeanScaleHyperprior.hyper_analysis)
                            - p["entropy_bottleneck"]["quantiles"][None, None, None, :, 0, 1]
                        ),
                        -32768, 32767,
                    ).astype(jnp.int16),
                )
            )(m.apply({"params": p}, xx, method=MeanScaleHyperprior.analysis)),
        )
        y_dev, z_sym_dev = enc(self.params, x)
        eb, medians, gc = self._tables()
        # dispatch the whole device graph first (async), then ONE batched
        # download for all three integer planes — separate np.asarray calls
        # pay a full link round trip each
        y_hw = (y_dev.shape[1], y_dev.shape[2])
        yi_dev, means_dev = self._hs_idx_fn(z_sym_dev.shape, y_hw)(self.params, z_sym_dev)
        sym = self._fn(
            ("sym",),
            lambda: lambda yy, mm: jnp.clip(jnp.round(yy - mm), -32768, 32767).astype(jnp.int16),
        )
        z_sym, y_sym, yi = jax.device_get([z_sym_dev, sym(y_dev, means_dev), yi_dev])
        z_idx = eb_build_indexes(z_sym.shape[1:], z_sym.shape[-1])
        z_bs = self._enc.encode_with_indexes(
            z_sym.ravel(), z_idx.ravel(), eb.cdfs, eb.cdf_lengths, eb.offsets
        )
        y_bs = self._enc.encode_with_indexes(
            y_sym.ravel(), yi.ravel(), gc.cdfs, gc.cdf_lengths, gc.offsets,
        )
        write_uints(fd, (y_hw[0], y_hw[1], z_sym.shape[1], z_sym.shape[2]))
        write_uints(fd, (len(z_bs),))
        write_bytes(fd, z_bs)
        write_uints(fd, (len(y_bs),))
        write_bytes(fd, y_bs)

    def _decode_frame(self, fd, h, w):
        m = self.model
        yh, yw, zh, zw = read_uints(fd, 4)
        (zlen,) = read_uints(fd, 1)
        z_bs = read_bytes(fd, zlen)
        (ylen,) = read_uints(fd, 1)
        y_bs = read_bytes(fd, ylen)
        eb, medians, gc = self._tables()
        cz = m.num_filters
        cy = m.latent_filters
        z_idx = eb_build_indexes((zh, zw, cz), cz)
        z_sym = self._dec.decode_with_indexes(
            z_bs, z_idx.ravel(), eb.cdfs, eb.cdf_lengths, eb.offsets
        ).reshape(1, zh, zw, cz).astype(np.int16)
        yi_dev, means_dev = self._hs_idx_fn(z_sym.shape, (yh, yw))(
            self.params, jnp.asarray(z_sym)
        )
        y_sym = self._dec.decode_with_indexes(
            y_bs, np.asarray(yi_dev).ravel(), gc.cdfs, gc.cdf_lengths, gc.offsets
        )
        dequant = self._fn(
            ("deq",),
            lambda: lambda ss, mm: ss.astype(jnp.float32) + mm,
        )
        y_hat = dequant(jnp.asarray(y_sym.reshape(1, yh, yw, cy).astype(np.int16)), means_dev)
        syn = self._fn(
            ("s", (yh, yw, h, w)),
            lambda: lambda p, yy: m.apply(
                {"params": p}, yy, (h, w), method=MeanScaleHyperprior.synthesis
            ),
        )
        return np.asarray(syn(self.params, jnp.asarray(y_hat)), np.float32)
