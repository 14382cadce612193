"""Learned L-MSFC-V2 feature codec plugin — the framework's flagship codec.

Device side (jit, bfloat16, Pallas GDN): FENet analysis, hyperprior, DRNet
synthesis. Host side: quantized-CDF tables + C++ rANS producing a REAL
self-decodable bitstream (unlike the anchors, no fpn-sizes sideband needed:
level names/shapes ride in the header).

Bitstream layout (big-endian, via utils.readwrite — same writer family as
the reference's anchor headers, codecs/encdec_utils/readwrite.py:50-91):

  magic 'LMF2' | version u8 | n_levels u8 | n_frames u32
  per level: name_len u8 | name ascii | C u32 | H u32 | W u32
  y: H u32 | W u32 | C u32       z: H u32 | W u32 | C u32
  per frame: z_len u32 | z_bytes | y_len u32 | y_bytes

Registered as codec "lmsfc" with the standard encode/decode contract
(ref codecs/base.py:61-119), so every pipeline runs unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.entropy_bottleneck import build_eb_cdf_table
from ..entropy.gaussian_conditional import GaussianConditional
from ..models.lmsfc import LMSFCv2
from ..native import RansDecoder, RansEncoder
from ..registry import register_codec
from ..utils.readwrite import (
    read_bytes,
    read_uchars,
    read_uints,
    write_bytes,
    write_uchars,
    write_uints,
)

_MAGIC = b"LMF2"
_VERSION = 3


@register_codec("lmsfc")
class LMSFCCodec:
    def __init__(
        self,
        vision_model: Any = None,
        dataset: Any = None,
        eval_encode: str = "bpp",
        qp: Optional[int] = None,
        num_filters: int = 192,
        latent_filters: int = 192,
        hyper_filters: int = 128,
        out_channels: Sequence[int] = (256, 256, 256, 256),
        num_rates: int = 0,
        checkpoint_dir: Optional[str] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
        dtype: str = "bfloat16",
        chunk_frames: int = 8,
        mesh=None,
        **kwargs,
    ):
        import logging

        self.logger = logging.getLogger(self.__class__.__name__)
        self.vision_model = vision_model
        self.dataset = dataset
        self.qp = qp
        self.eval_encode = eval_encode
        self.out_channels = tuple(out_channels)
        self.num_rates = int(num_rates)
        self.model = LMSFCv2(
            out_channels=self.out_channels,
            num_filters=num_filters,
            latent_filters=latent_filters,
            hyper_filters=hyper_filters,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            num_rates=self.num_rates,
        )
        # gain-unit models: qp selects the rate point within ONE checkpoint
        self.rate_idx = max(0, (qp or 1) - 1) if self.num_rates else 0
        self._params = params
        self._checkpoint_dir = checkpoint_dir
        self._seed = seed
        self._gaussian = GaussianConditional()
        self._gc_table = None
        self._eb_table = None
        self._enc = RansEncoder()
        self._dec = RansDecoder()
        self._jit_cache: Dict = {}
        # fixed per-compile frame-chunk: one XLA program regardless of
        # sequence length (the video pipeline codes whole sequences at once,
        # ref video_split_inference.py:265-286), memory bounded.
        # The header stores it as a u8, so it must fit one byte — otherwise
        # the decoder would re-chunk differently and desync the rANS stream.
        self.chunk_frames = int(chunk_frames)
        if not 1 <= self.chunk_frames <= 255:
            raise ValueError(f"chunk_frames must be in [1, 255], got {chunk_frames}")
        # optional dp mesh: shard the frame axis of analysis/synthesis —
        # frames are independent (intra coding), so eval scales linearly
        self.mesh = mesh

    # ------------------------------------------------------------ params
    def _example_features(self) -> List[jax.Array]:
        feats = []
        h, w = 64, 64
        for c in self.out_channels:
            feats.append(jnp.zeros((1, h, w, c), jnp.float32))
            h, w = -(-h // 2), -(-w // 2)
        return feats

    @property
    def params(self) -> Dict:
        if self._params is None:
            if self._checkpoint_dir is not None:
                from ..training.checkpoint import CheckpointManager

                mgr = CheckpointManager(Path(self._checkpoint_dir))
                restored = mgr.restore()
                if restored is not None:
                    self._params = restored["params"]
            if self._params is None:
                self.logger.warning("no checkpoint; initializing random codec params")
                variables = self.model.init(
                    {"params": jax.random.key(self._seed), "noise": jax.random.key(1)},
                    self._example_features(),
                )
                self._params = variables["params"]
        return self._params

    # ------------------------------------------------------------- tables
    def _tables(self):
        if self._gc_table is None:
            self._gc_table = self._gaussian.cdf_table()
            self._eb_table = build_eb_cdf_table(
                jax.tree_util.tree_map(np.asarray, self.params["entropy_bottleneck"])
            )
            self._eb_medians = np.asarray(self.params["entropy_bottleneck"]["quantiles"])[:, 0, 1]
        return self._gc_table, self._eb_table

    # -------------------------------------------------------------- jit fns
    def _shardings(self):
        if self.mesh is None:
            return {}
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        dp = NamedSharding(self.mesh, P("dp"))
        return {"repl": repl, "dp": dp}

    def _analysis_fn(self, shapes: Tuple, rate_idx: int):
        key = ("analysis", shapes, rate_idx)
        if key not in self._jit_cache:

            def fn(params, features):
                return self.model.apply(
                    {"params": params}, list(features), rate_idx,
                    method=LMSFCv2.analysis,
                )

            sh = self._shardings()
            if sh:
                fn = jax.jit(fn, in_shardings=(sh["repl"], sh["dp"]),
                             out_shardings=sh["dp"])
            else:
                fn = jax.jit(fn)
            self._jit_cache[key] = fn
        return self._jit_cache[key]

    @staticmethod
    def _chunk_iter(n_frames: int, chunk: int):
        """Yield (start, count) over fixed-size frame chunks."""
        c = max(1, chunk)
        for s in range(0, n_frames, c):
            yield s, min(c, n_frames - s)

    def _hyper_synthesis_fn(self, y_hw: Tuple[int, int]):
        key = ("hsyn", y_hw)
        if key not in self._jit_cache:

            @jax.jit
            def fn(params, z_hat):
                return self.model.apply(
                    {"params": params}, z_hat, y_hw, method=LMSFCv2.hyper_synthesis
                )

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _synthesis_fn(self, shapes_hw: Tuple[Tuple[int, int], ...], rate_idx: int):
        key = ("syn", shapes_hw, rate_idx)
        if key not in self._jit_cache:

            def fn(params, y_hat):
                return self.model.apply(
                    {"params": params}, y_hat, shapes_hw, rate_idx,
                    method=LMSFCv2.synthesis,
                )

            sh = self._shardings()
            if sh:
                fn = jax.jit(fn, in_shardings=(sh["repl"], sh["dp"]),
                             out_shardings=sh["dp"])
            else:
                fn = jax.jit(fn)
            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _chunked_gaussian_params(self, hyper_syn, z_hat_all, n_frames, chunk):
        """Run hyper-synthesis in fixed-size chunks (tail edge-padded);
        identical on encoder and decoder => bit-identical scales/means."""
        chunk = max(1, chunk)
        scales_parts, means_parts = [], []
        for s, cnt in self._chunk_iter(n_frames, chunk):
            part = z_hat_all[s : s + cnt]
            if cnt < chunk:
                part = np.concatenate(
                    [part, np.repeat(part[-1:], chunk - cnt, axis=0)]
                )
            sc, mn = hyper_syn(self.params, jnp.asarray(part))
            scales_parts.append(np.asarray(sc, np.float32)[:cnt])
            means_parts.append(np.asarray(mn, np.float32)[:cnt])
        return np.concatenate(scales_parts), np.concatenate(means_parts)

    # --------------------------------------------------------------- encode
    def encode(
        self,
        input: Dict,
        codec_output_dir: str = "",
        bitstream_name: str = "bitstream",
        file_prefix: str = "",
        img_input: bool = False,
    ) -> Dict:
        assert not img_input, "lmsfc is a feature codec (split-inference only)"
        data: Dict[str, Any] = input["data"]
        names = list(data.keys())
        # NCHW -> NHWC, finest first (reference order is already finest first)
        feats = [jnp.transpose(jnp.asarray(np.asarray(v)), (0, 2, 3, 1)) for v in data.values()]
        n_frames = feats[0].shape[0]
        level_shapes = [(f.shape[3], f.shape[1], f.shape[2]) for f in feats]  # C,H,W

        # fixed-size chunks: pad the tail chunk by edge-repeat so every call
        # hits the same compiled program
        chunk = max(1, self.chunk_frames)
        analysis = self._analysis_fn(
            tuple((chunk,) + tuple(f.shape[1:]) for f in feats), self.rate_idx
        )
        y_parts, z_parts = [], []
        for s, cnt in self._chunk_iter(n_frames, chunk):
            part = [f[s : s + cnt] for f in feats]
            if cnt < chunk:
                part = [
                    jnp.concatenate([p, jnp.repeat(p[-1:], chunk - cnt, axis=0)])
                    for p in part
                ]
            yc, zc, _, _ = analysis(self.params, part)
            y_parts.append(np.asarray(yc, np.float32)[:cnt])
            z_parts.append(np.asarray(zc, np.float32)[:cnt])
        y = np.concatenate(y_parts)
        z = np.concatenate(z_parts)
        gc_table, eb_table = self._tables()

        z_np = np.asarray(z, np.float32)
        y_np = np.asarray(y, np.float32)
        z_sym = np.round(z_np - self._eb_medians[None, None, None, :]).astype(np.int32)
        z_idx = np.broadcast_to(
            np.arange(z_np.shape[-1], dtype=np.int32), z_np.shape[1:]
        )
        # Gaussian params are recomputed from the QUANTIZED z through the
        # exact chunked program the decoder runs (chunk size rides in the
        # header): identical program + identical per-frame inputs => bit-
        # identical scales/means, so rANS never desyncs. Batch elements are
        # independent in convs, so tail padding cannot leak across frames.
        hyper_syn = self._hyper_synthesis_fn((y.shape[1], y.shape[2]))
        z_hat_all = z_sym.astype(np.float32) + self._eb_medians[None, None, None, :]
        scales_np, means_np = self._chunked_gaussian_params(
            hyper_syn, z_hat_all, n_frames, chunk
        )

        out_dir = Path(codec_output_dir) if codec_output_dir else Path(".")
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = f"{file_prefix}_" if file_prefix else ""
        path = out_dir / f"{stem}{bitstream_name}.bin"

        byte_sizes: List[int] = []
        with open(path, "wb") as fd:
            fd.write(_MAGIC)
            write_uchars(
                fd, (_VERSION, len(names), self.chunk_frames, self.rate_idx)
            )
            write_uints(fd, (n_frames,))
            for name, (c, h, w) in zip(names, level_shapes):
                nb = name.encode("ascii")
                write_uchars(fd, (len(nb),))
                write_bytes(fd, nb)
                write_uints(fd, (c, h, w))
            write_uints(fd, (y.shape[1], y.shape[2], y.shape[3]))
            write_uints(fd, (z.shape[1], z.shape[2], z.shape[3]))
            header_bytes = fd.tell()

            # frames are independent: fan the rANS coding over a thread
            # pool (the C coder releases the GIL; mirrors the reference's
            # GOP-parallel anchor encoding, std_codecs.py:204-255)
            from concurrent.futures import ThreadPoolExecutor

            def _code_frame(f_idx):
                z_bytes = self._enc.encode_with_indexes(
                    z_sym[f_idx].ravel(), z_idx.ravel(),
                    eb_table.cdfs, eb_table.cdf_lengths, eb_table.offsets,
                )
                y_sym = np.round(y_np[f_idx] - means_np[f_idx]).astype(np.int32)
                y_idx = GaussianConditional.build_indexes(scales_np[f_idx])
                y_bytes = self._enc.encode_with_indexes(
                    y_sym.ravel(), y_idx.ravel(),
                    gc_table.cdfs, gc_table.cdf_lengths, gc_table.offsets,
                )
                return z_bytes, y_bytes

            with ThreadPoolExecutor() as pool:
                coded = list(pool.map(_code_frame, range(n_frames)))
            for z_bytes, y_bytes in coded:
                write_uints(fd, (len(z_bytes),))
                write_bytes(fd, z_bytes)
                write_uints(fd, (len(y_bytes),))
                write_bytes(fd, y_bytes)
                byte_sizes.append(len(z_bytes) + len(y_bytes) + 8)

        # amortize header over frames (reference amortizes its header too)
        per_frame_header = header_bytes / n_frames
        byte_sizes = [b + per_frame_header for b in byte_sizes]
        return {"bytes": byte_sizes, "bitstream": str(path)}

    # --------------------------------------------------------------- decode
    def decode(
        self,
        input,
        codec_output_dir: str = "",
        file_prefix: str = "",
        org_img_size: Optional[Dict] = None,
        img_input: bool = False,
    ) -> Dict:
        path = Path(input if isinstance(input, (str, Path)) else input["bitstream"])
        gc_table, eb_table = self._tables()

        with open(path, "rb") as fd:
            magic = fd.read(4)
            assert magic == _MAGIC, f"bad magic {magic!r}"
            version, n_levels, chunk_in_stream, rate_idx = read_uchars(fd, 4)
            assert version == _VERSION
            (n_frames,) = read_uints(fd, 1)
            # the gaussian-param program must match the encoder's chunking;
            # both ride in the header and stay LOCAL to this call — decoding
            # a stream must not reconfigure the codec instance
            chunk = max(1, int(chunk_in_stream))
            rate_idx = int(rate_idx) if self.num_rates else 0
            names, level_shapes = [], []
            for _ in range(n_levels):
                (name_len,) = read_uchars(fd, 1)
                names.append(read_bytes(fd, name_len).decode("ascii"))
                c, h, w = read_uints(fd, 3)
                level_shapes.append((c, h, w))
            y_h, y_w, y_c = read_uints(fd, 3)
            z_h, z_w, z_c = read_uints(fd, 3)

            z_idx = np.broadcast_to(
                np.arange(z_c, dtype=np.int32), (z_h, z_w, z_c)
            ).ravel()
            hyper_syn = self._hyper_synthesis_fn((y_h, y_w))
            shapes_hw = tuple((h, w) for (_, h, w) in level_shapes)
            synthesis = self._synthesis_fn(shapes_hw, rate_idx)

            z_streams, y_streams = [], []
            for _ in range(n_frames):
                (z_len,) = read_uints(fd, 1)
                z_streams.append(read_bytes(fd, z_len))
                (y_len,) = read_uints(fd, 1)
                y_streams.append(read_bytes(fd, y_len))

        from concurrent.futures import ThreadPoolExecutor

        z_hat_all = np.empty((n_frames, z_h, z_w, z_c), np.float32)

        def _dec_z(i):
            z_sym = self._dec.decode_with_indexes(
                z_streams[i], z_idx, eb_table.cdfs, eb_table.cdf_lengths, eb_table.offsets
            ).reshape(z_h, z_w, z_c)
            z_hat_all[i] = z_sym.astype(np.float32) + self._eb_medians[None, None, :]

        with ThreadPoolExecutor() as pool:
            list(pool.map(_dec_z, range(n_frames)))

        scales_np, means_np = self._chunked_gaussian_params(
            hyper_syn, z_hat_all, n_frames, chunk
        )
        y_hat_all = np.empty((n_frames, y_h, y_w, y_c), np.float32)

        def _dec_y(i):
            y_idx = GaussianConditional.build_indexes(scales_np[i]).ravel()
            y_sym = self._dec.decode_with_indexes(
                y_streams[i], y_idx, gc_table.cdfs, gc_table.cdf_lengths, gc_table.offsets
            ).reshape(y_h, y_w, y_c)
            y_hat_all[i] = y_sym.astype(np.float32) + means_np[i]

        with ThreadPoolExecutor() as pool:
            list(pool.map(_dec_y, range(n_frames)))
        recon_parts: List[List[np.ndarray]] = []
        for s, cnt in self._chunk_iter(n_frames, chunk):
            part = y_hat_all[s : s + cnt]
            if cnt < chunk:
                part = np.concatenate([part, np.repeat(part[-1:], chunk - cnt, axis=0)])
            recon = synthesis(self.params, jnp.asarray(part))
            recon_parts.append([np.asarray(r, np.float32)[:cnt] for r in recon])
        merged = [
            np.concatenate([p[i] for p in recon_parts], axis=0)
            for i in range(len(names))
        ]
        data = {
            name: jnp.asarray(np.transpose(r, (0, 3, 1, 2)))
            for name, r in zip(names, merged)
        }
        return {"data": data}

    @property
    def qp_value(self):
        return self.qp

    @property
    def eval_encode_type(self):
        return self.eval_encode
