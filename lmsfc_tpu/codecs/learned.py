"""Learned L-MSFC-V2 feature codec plugin — the framework's flagship codec.

Device side (jit, bfloat16, Pallas GDN): FENet analysis, hyperprior, DRNet
synthesis, PLUS all quantization/index derivation — the host only ever
exchanges integer symbol planes (i16 symbols up/down, u8 scale indexes
down) with the chip; the f32 latents and gaussian params never cross the
wire. Host side: quantized-CDF tables + C++ rANS producing a REAL
self-decodable bitstream (unlike the anchors, no fpn-sizes sideband needed:
level names/shapes ride in the header). decode() returns DEVICE-RESIDENT
NCHW arrays (execution forced by a scalar readback): NN-Part2 runs on the
same chip, so the reference's decode->CPU->GPU round trip has no analogue
here. Host f32 feature inputs to a bf16 model ship as f16 (half the wire
bytes, mantissa superset of bf16).

Bitstream layout v4 (big-endian, via utils.readwrite — same writer family
as the reference's anchor headers, codecs/encdec_utils/readwrite.py:50-91):

  magic 'LMF2' | version u8 | n_levels u8 | chunk_frames u8 | rate_idx u8
  | n_slices u8 | n_frames u32
  per level: name_len u8 | name ascii | C u32 | H u32 | W u32
  y: H u32 | W u32 | C u32       z: H u32 | W u32 | C u32
  per frame: z_len u32 | z_bytes | then max(1, n_slices) times:
             y_len u32 | y_bytes   (one stream per ChARM channel slice;
             a single stream when n_slices == 0)

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
from ._jit_cache import MeshJitCache
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
_VERSION = 5  # v5: rANS payloads are 4-way interleaved (native/rans.cpp);
# v4 added the n_slices header byte + per-slice y streams (ChARM)
_RANS_STREAMS = 4


def _wire_stats(tag: str, arrays) -> None:
    """LMSFC_WIRE_STATS=1: log bytes crossing the host<->device wire per
    batched transfer — the data that decides whether the next perf round
    targets the wire (sparse packing), the host coder, or dispatch."""
    import logging
    import os

    if os.environ.get("LMSFC_WIRE_STATS") != "1":
        return
    total = sum(
        getattr(a, "nbytes", 0) for a in jax.tree_util.tree_leaves(arrays)
    )
    logging.getLogger("LMSFCCodec").info(
        "wire[%s]: %.1f KB", tag, total / 1024.0
    )


@register_codec("lmsfc")
class LMSFCCodec(MeshJitCache):
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
        num_slices: int = 0,
        lrp: bool = False,
        latent_stride_div: int = 2,
        checkpoint_dir: Optional[str] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
        dtype: str = "bfloat16",
        chunk_frames: int = 8,
        max_inflight_chunks: int = 32,
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
        self.num_slices = int(num_slices)
        self.model = LMSFCv2(
            out_channels=self.out_channels,
            num_filters=num_filters,
            latent_filters=latent_filters,
            hyper_filters=hyper_filters,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            num_rates=self.num_rates,
            num_slices=self.num_slices,
            lrp=bool(lrp),
            latent_stride_div=int(latent_stride_div),
        )
        self.lrp = bool(lrp)
        # gain-unit models: qp selects the rate point within ONE checkpoint
        self.rate_idx = max(0, (qp or 1) - 1) if self.num_rates else 0
        self._params = params
        self._params_on_device = False
        self._checkpoint_dir = checkpoint_dir
        self._seed = seed
        self._gaussian = GaussianConditional()
        self._gc_table = None
        self._eb_table = None
        self._enc = RansEncoder(streams=_RANS_STREAMS)
        self._dec = RansDecoder(streams=_RANS_STREAMS)
        self._jit_cache: Dict = {}
        # fixed per-compile frame-chunk: one XLA program regardless of
        # sequence length (the video pipeline codes whole sequences at once,
        # ref video_split_inference.py:265-286), memory bounded.
        # The header stores it as a u8, so it must fit one byte — otherwise
        # the decoder would re-chunk differently and desync the rANS stream.
        self.chunk_frames = int(chunk_frames)
        if not 1 <= self.chunk_frames <= 255:
            raise ValueError(f"chunk_frames must be in [1, 255], got {chunk_frames}")
        # encode-side bound on dispatched-but-undownloaded chunks (peak HBM
        # grows with this window; see the windowed _drain in encode)
        self.max_inflight_chunks = max(1, int(max_inflight_chunks))
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
        if not self._params_on_device:
            from ..utils.tree import device_pin

            # checkpoints/driver code hand over host numpy trees; pin them to
            # the device ONCE — otherwise every jit call re-uploads the full
            # weight set (catastrophic on a slow host<->device link)
            self._params = device_pin(self._params)
            self._params_on_device = True
        return self._params

    # ------------------------------------------------------------- tables
    def _tables(self):
        if self._gc_table is None:
            self._gc_table = self._gaussian.cdf_table()
            self._eb_table = build_eb_cdf_table(
                jax.tree_util.tree_map(np.asarray, self.params["entropy_bottleneck"])
            )
        return self._gc_table, self._eb_table

    # ------------------------------------------ jit fns (mixin: _cached_jit)
    def _hyper_params(self, params, z_sym, y_hw):
        """Shared prologue of every hyper-derived program: coded z symbols
        -> (scales_h, means_h). Single source so encoder- and decoder-side
        builders can never drift in the z_hat/median handling."""
        medians = params["entropy_bottleneck"]["quantiles"][:, 0, 1]
        z_hat = z_sym.astype(jnp.float32) + medians[None, None, None, :]
        return self.model.apply(
            {"params": params}, z_hat, y_hw, method=LMSFCv2.hyper_synthesis
        )

    def _syn_nchw(self, params, y_hat, shapes_hw, rate_idx):
        """Shared synthesis tail: y_hat -> device-resident NCHW levels."""
        recon = self.model.apply(
            {"params": params}, y_hat, shapes_hw, rate_idx,
            method=LMSFCv2.synthesis,
        )
        return [jnp.transpose(r, (0, 3, 1, 2)) for r in recon]

    def _analysis_fn(self, shapes: Tuple, rate_idx: int):
        """fn(params, features) -> (y f32, z_sym i16), both device-resident.

        z is quantized ON DEVICE (round around the EB medians): the host
        only ever sees integer symbols, never the f32 latents."""
        def fn(params, features):
            y, z = self.model.apply(
                {"params": params}, list(features), rate_idx,
                method=LMSFCv2.analysis_latents,
            )
            medians = params["entropy_bottleneck"]["quantiles"][:, 0, 1]
            # i16 wire: latent symbols are a few hundred at most (the
            # clip keeps a pathological activation from wrapping)
            z_sym = jnp.clip(
                jnp.round(z - medians[None, None, None, :]), -32768, 32767
            ).astype(jnp.int16)
            return y, z_sym

        return self._cached_jit(("analysis", shapes, rate_idx), fn, arity=2)

    @staticmethod
    def _chunk_iter(n_frames: int, chunk: int):
        """Yield (start, count) over fixed-size frame chunks."""
        c = max(1, chunk)
        for s in range(0, n_frames, c):
            yield s, min(c, n_frames - s)

    def _hyper_idx_fn(self, y_hw: Tuple[int, int]):
        """fn(params, z_sym i16) -> (y_idx u8, means f32).

        The ONE program both sides run to derive coding state from the coded
        z symbols: z_hat = z_sym + medians, (scales, means) = h_s(z_hat),
        y_idx = scale-table indexes (GaussianConditional.build_indexes_device,
        same tie semantics as the host loop). Computing the indexes inside
        this jit guarantees encoder and decoder see identical ints — they are
        integer functions of the same program's floats, so no 1-ulp fusion
        drift can desync the rANS stream (ADVICE r1 #2)."""
        def fn(params, z_sym):
            scales, means = self._hyper_params(params, z_sym, y_hw)
            return GaussianConditional.build_indexes_device(scales), means

        return self._cached_jit(("hidx", y_hw), fn, arity=2)

    def _sym_fn(self):
        """fn(y f32, means f32) -> (y_sym8 i8, n_over i32[frames], y_sym i16)
        (encoder-only quantization).

        i8 wire: trained models' residual symbols sit within [-128,127]
        essentially always, and the y-symbol plane is the largest
        device->host transfer on the encode path — shipping it as i8 halves
        it. n_over counts saturated elements per frame so the drain falls
        back to the (still device-resident) i16 plane for the rare chunk
        that needs it; the bitstream itself is dtype-independent."""
        def fn(y, means):
            s = jnp.clip(jnp.round(y - means), -32768, 32767).astype(jnp.int16)
            s8 = jnp.clip(s, -128, 127).astype(jnp.int8)
            over = jnp.sum(
                (s != s8.astype(jnp.int16)).reshape(s.shape[0], -1),
                axis=1, dtype=jnp.int32,
            )
            return s8, over, s

        return self._cached_jit(("sym",), fn, arity=2, repl_args=0)

    def _syn_fn(self, shapes_hw: Tuple[Tuple[int, int], ...], rate_idx: int):
        """fn(params, y_sym i8/i16, means f32) -> list of NCHW f32 recon
        levels (jit specializes per symbol dtype; the i8 wire is safe here
        because synthesis is terminal — nothing downstream entropy-codes).

        Dequantization (y_hat = y_sym + means) and the NHWC->NCHW transpose
        happen on device: the host uploads integer symbols and the pyramid
        comes back ready for NN-Part2 without any host-side passes."""
        def fn(params, y_sym, means):
            y_hat = y_sym.astype(jnp.float32) + means
            return self._syn_nchw(params, y_hat, shapes_hw, rate_idx)

        return self._cached_jit(("syn", shapes_hw, rate_idx), fn, arity=3)

    # ------------------------------------------------- ChARM slice programs
    def _hyper_support_fn(self, y_hw: Tuple[int, int]):
        """ChARM: fn(params, z_sym i16) -> support0 = concat(scales_h,
        means_h), device-resident on both sides."""
        def fn(params, z_sym):
            scales_h, means_h = self._hyper_params(params, z_sym, y_hw)
            return jnp.concatenate([scales_h, means_h], axis=-1)

        return self._cached_jit(("hsup", y_hw), fn, arity=2)

    def _slice_idx_fn(self, i: int):
        """ChARM: fn(params, support) -> (y_idx_i u8, means_i f32) for
        channel slice i; shared verbatim by encoder and decoder (the
        support concat is pure data movement, so the only float math lives
        inside this one program — same desync-proof shape as _hyper_idx_fn)."""
        def fn(params, support):
            scales_i, means_i = self.model.apply(
                {"params": params}, support, i, method=LMSFCv2.slice_params
            )
            return GaussianConditional.build_indexes_device(scales_i), means_i

        return self._cached_jit(("sidx", i), fn, arity=2)

    def _deq_fn(self):
        """fn(y_sym i16, means) -> y_hat f32 — the decoded slice BOTH sides
        feed forward as conditioning (shared program => identical chain)."""
        def fn(y_sym, means):
            return y_sym.astype(jnp.float32) + means

        return self._cached_jit(("deq",), fn, arity=2, repl_args=0)

    def _deq_slice_fn(self, i: int):
        """fn(params, support, y_sym i16, means) -> decoded slice i, with
        the LRP correction fused in when the model has one. The corrected
        slice is what BOTH sides feed forward as conditioning, so the LRP
        residual is part of the shared-program wire discipline."""
        if not self.lrp:
            base = self._deq_fn()
            return lambda params, sup, ys, mn: base(ys, mn)

        def fn(params, sup, ys, mn):
            y_raw = ys.astype(jnp.float32) + mn
            r = self.model.apply(
                {"params": params},
                jnp.concatenate([sup, y_raw], axis=-1), i,
                method=LMSFCv2.slice_lrp,
            )
            return y_raw + r

        return self._cached_jit(("deqlrp", i), fn, arity=4)

    def _syn_hat_fn(self, shapes_hw: Tuple[Tuple[int, int], ...], rate_idx: int):
        """ChARM decode tail: fn(params, y_hat f32) -> NCHW recon levels."""
        def fn(params, y_hat):
            return self._syn_nchw(params, y_hat, shapes_hw, rate_idx)

        return self._cached_jit(("synh", shapes_hw, rate_idx), fn, arity=2)

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
        # NCHW -> NHWC on DEVICE (device inputs stay resident — no download).
        # Host f32 inputs to a bf16 model ship as f16: half the PCIe/relay
        # bytes, zero quality loss (f16's 10-bit mantissa >= bf16's 8, and
        # FPN features are far inside f16 range — BASELINE.md dynamic ranges).
        half_wire = self.model.dtype == jnp.bfloat16
        feats = []
        for v in data.values():
            if half_wire and isinstance(v, np.ndarray) and v.dtype == np.float32:
                v = v.astype(np.float16)
            feats.append(jnp.transpose(jnp.asarray(v), (0, 2, 3, 1)))
        n_frames = feats[0].shape[0]
        level_shapes = [(f.shape[3], f.shape[1], f.shape[2]) for f in feats]  # C,H,W

        # fixed-size chunks: pad the tail chunk by edge-repeat so every call
        # hits the same compiled program
        chunk = max(1, self.chunk_frames)
        analysis = self._analysis_fn(
            tuple((chunk,) + tuple(f.shape[1:]) for f in feats), self.rate_idx
        )
        gc_table, eb_table = self._tables()

        # dispatch ALL device work first (jax is async): analysis, gaussian-
        # param/index derivation, and y quantization pipeline across chunks
        # while earlier chunks' symbol downloads and host rANS proceed.
        # Plain mode codes y as one stream; ChARM (num_slices>0) codes one
        # stream per channel slice, each conditioned on the decoded previous
        # slices (the conditioning chain runs on device via _deq_fn).
        sym = self._sym_fn()
        n_sl = max(1, self.num_slices)
        hyper_idx = None

        # downloads (ints only: u8 indexes + i16 symbols; the f32 latents and
        # gaussian params never leave the device). PIPELINED drain->code:
        # a single drain worker downloads each chunk's planes (one batched
        # device_get per chunk — separate per-plane fetches pay a full link
        # round trip each, measured 2x on the relay) while the main thread
        # keeps dispatching later chunks, and per-frame rANS jobs (the C
        # coder releases the GIL; mirrors the reference's GOP-parallel
        # anchor encoding, std_codecs.py:204-255) start the moment their
        # chunk lands — so transfers overlap BOTH device compute and host
        # entropy coding. In-flight device handles stay bounded to
        # max_inflight_chunks so peak HBM is O(window), not O(sequence)
        # (ADVICE r2 #5). Chunk-ordered futures keep the stream layout
        # byte-identical to the previous serial form.
        from concurrent.futures import ThreadPoolExecutor

        code_pool = ThreadPoolExecutor()
        drain_pool = ThreadPoolExecutor(max_workers=1)
        z_idx_r: Optional[np.ndarray] = None  # set after the first dispatch

        def _code_frame_arrays(z_np, yi_list, ys_list):
            z_bytes = self._enc.encode_with_indexes(
                z_np.ravel(), z_idx_r,
                eb_table.cdfs, eb_table.cdf_lengths, eb_table.offsets,
            )
            y_streams = [
                self._enc.encode_with_indexes(
                    ys_list[i].ravel(), yi_list[i].ravel(),
                    gc_table.cdfs, gc_table.cdf_lengths, gc_table.offsets,
                )
                for i in range(n_sl)
            ]
            return z_bytes, y_streams

        def _drain_chunk(cnt, zs_c, yis, yss, overs, ys16s):
            # one batched device_get: z, indexes, i8 symbol planes, and the
            # per-frame saturation counters all land in a single relay call
            flat = jax.device_get([zs_c] + yis + yss + overs)
            _wire_stats("enc_down", flat)
            z_np = flat[0]
            yi_np = flat[1 : 1 + n_sl]
            ys_np = list(flat[1 + n_sl : 1 + 2 * n_sl])
            over_np = flat[1 + 2 * n_sl :]
            for i in range(n_sl):
                # a saturated i8 plane would corrupt the stream: re-fetch
                # the exact i16 plane for this (rare) chunk/slice
                if over_np[i][:cnt].any():
                    ys_np[i] = jax.device_get(ys16s[i])
            # pad rows (tail chunk) are simply never submitted
            return [
                code_pool.submit(
                    _code_frame_arrays, z_np[j],
                    [yi[j] for yi in yi_np], [ys[j] for ys in ys_np],
                )
                for j in range(cnt)
            ]

        try:
            drain_futs = []  # one per chunk, each resolving to per-frame futures
            for s, cnt in self._chunk_iter(n_frames, chunk):
                if len(drain_futs) >= self.max_inflight_chunks:
                    drain_futs[len(drain_futs) - self.max_inflight_chunks].result()
                part = [f[s : s + cnt] for f in feats]
                if cnt < chunk:
                    part = [
                        jnp.concatenate([p, jnp.repeat(p[-1:], chunk - cnt, axis=0)])
                        for p in part
                    ]
                yc, zs_c = analysis(self.params, part)
                if hyper_idx is None:
                    y_shape = yc.shape  # metadata only — no device sync
                    z_shape = zs_c.shape
                    y_hw = (y_shape[1], y_shape[2])
                    hyper_idx = (
                        self._hyper_support_fn(y_hw)
                        if self.num_slices
                        else self._hyper_idx_fn(y_hw)
                    )
                if self.num_slices:
                    support0 = hyper_idx(self.params, zs_c)
                    cs = self.model.latent_filters // self.num_slices
                    y_hat_parts, yis, yss, overs, ys16s = [], [], [], [], []
                    for i in range(self.num_slices):
                        sup = jnp.concatenate([support0] + y_hat_parts, axis=-1)
                        yi_i, mn_i = self._slice_idx_fn(i)(self.params, sup)
                        ys8_i, over_i, ys16_i = sym(
                            yc[..., i * cs : (i + 1) * cs], mn_i
                        )
                        # conditioning consumes the exact i16 symbols; only
                        # the wire copy is i8
                        y_hat_parts.append(
                            self._deq_slice_fn(i)(self.params, sup, ys16_i, mn_i)
                        )
                        yis.append(yi_i)
                        yss.append(ys8_i)
                        overs.append(over_i)
                        ys16s.append(ys16_i)
                else:
                    yi_c, mn_c = hyper_idx(self.params, zs_c)
                    ys8_c, over_c, ys16_c = sym(yc, mn_c)
                    yis, yss = [yi_c], [ys8_c]
                    overs, ys16s = [over_c], [ys16_c]
                if z_idx_r is None:
                    z_idx_r = np.ascontiguousarray(
                        np.broadcast_to(
                            np.arange(z_shape[-1], dtype=np.int32), z_shape[1:]
                        )
                    ).ravel()
                drain_futs.append(
                    drain_pool.submit(_drain_chunk, cnt, zs_c, yis, yss, overs, ys16s)
                )

            # chunk-ordered frame futures -> frame-ordered coded streams
            frame_futs = [f for df in drain_futs for f in df.result()]

            out_dir = Path(codec_output_dir) if codec_output_dir else Path(".")
            out_dir.mkdir(parents=True, exist_ok=True)
            stem = f"{file_prefix}_" if file_prefix else ""
            path = out_dir / f"{stem}{bitstream_name}.bin"

            byte_sizes: List[int] = []
            with open(path, "wb") as fd:
                fd.write(_MAGIC)
                write_uchars(
                    fd,
                    (_VERSION, len(names), self.chunk_frames, self.rate_idx,
                     self.num_slices),
                )
                write_uints(fd, (n_frames,))
                for name, (c, h, w) in zip(names, level_shapes):
                    nb = name.encode("ascii")
                    write_uchars(fd, (len(nb),))
                    write_bytes(fd, nb)
                    write_uints(fd, (c, h, w))
                write_uints(fd, (y_shape[1], y_shape[2], y_shape[3]))
                write_uints(fd, (z_shape[1], z_shape[2], z_shape[3]))
                header_bytes = fd.tell()

                for z_bytes, y_streams in (f.result() for f in frame_futs):
                    write_uints(fd, (len(z_bytes),))
                    write_bytes(fd, z_bytes)
                    total_y = 0
                    for yb in y_streams:
                        write_uints(fd, (len(yb),))
                        write_bytes(fd, yb)
                        total_y += len(yb) + 4
                    byte_sizes.append(len(z_bytes) + total_y + 4)
        finally:
            # idempotent on the success path (all futures resolved);
            # on error, cancel queued work so no thread hangs on a
            # never-submitted chunk
            drain_pool.shutdown(wait=False, cancel_futures=True)
            code_pool.shutdown(wait=False, cancel_futures=True)

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
            version, n_levels, chunk_in_stream, rate_idx, n_slices = read_uchars(fd, 5)
            if version != _VERSION:
                raise ValueError(
                    f"stream version {version} unsupported (current {_VERSION}); "
                    "streams written before the v5 interleaved-rANS payload "
                    "(e.g. pre-round-4 runs/ artifacts) must be re-encoded"
                )
            (n_frames,) = read_uints(fd, 1)
            # the gaussian-param program must match the encoder's chunking;
            # chunk/rate/slices all ride in the header and stay LOCAL to this
            # call — decoding a stream must not reconfigure the codec instance
            chunk = max(1, int(chunk_in_stream))
            rate_idx = int(rate_idx) if self.num_rates else 0
            n_slices = int(n_slices)
            assert n_slices == self.num_slices, (
                f"stream coded with num_slices={n_slices}, codec has "
                f"{self.num_slices} (slice networks are learned params)"
            )
            n_sl = max(1, n_slices)
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
            shapes_hw = tuple((h, w) for (_, h, w) in level_shapes)

            z_streams, y_streams = [], []
            for _ in range(n_frames):
                (z_len,) = read_uints(fd, 1)
                z_streams.append(read_bytes(fd, z_len))
                frame_slices = []
                for _ in range(n_sl):
                    (y_len,) = read_uints(fd, 1)
                    frame_slices.append(read_bytes(fd, y_len))
                y_streams.append(frame_slices)

        from concurrent.futures import ThreadPoolExecutor

        # i16 mirrors the encoder-side device dtype: both sides must feed the
        # SAME compiled hyper-idx program (dtype is part of the jit key)
        z_sym_all = np.empty((n_frames, z_h, z_w, z_c), np.int16)

        def _dec_z(i):
            z_sym_all[i] = self._dec.decode_with_indexes(
                z_streams[i], z_idx, eb_table.cdfs, eb_table.cdf_lengths, eb_table.offsets
            ).reshape(z_h, z_w, z_c)

        with ThreadPoolExecutor() as pool:
            list(pool.map(_dec_z, range(n_frames)))

        if n_slices:
            return self._decode_charm(
                z_sym_all, y_streams, names, shapes_hw, (y_h, y_w, y_c),
                n_frames, chunk, rate_idx, n_slices,
            )

        hyper_idx = self._hyper_idx_fn((y_h, y_w))
        synthesis = self._syn_fn(shapes_hw, rate_idx)

        # phases 1-3 PIPELINED per chunk (mirrors encode): dispatch the
        # hyper-idx program for every chunk up front (async), download each
        # chunk's y_idx planes in a single drain worker (one batched
        # device_get per chunk), start that chunk's per-frame rANS decodes
        # the moment its indexes land, and dispatch dequant+synthesis as
        # soon as the chunk's symbols are back — relay transfers overlap
        # device compute AND host entropy decode. The means stay
        # device-resident for the synthesis call; the decoded pyramid is
        # returned as DEVICE-RESIDENT NCHW (NN-Part2 runs on the same chip,
        # so the reference's decode->CPU->GPU round trip has no TPU
        # analogue).
        code_pool = ThreadPoolExecutor()
        drain_pool = ThreadPoolExecutor(max_workers=1)

        def _dec_y_frame(f_idx, yi_frame):
            return self._dec.decode_with_indexes(
                y_streams[f_idx][0], yi_frame.ravel(),
                gc_table.cdfs, gc_table.cdf_lengths, gc_table.offsets,
            ).reshape(y_h, y_w, y_c)

        def _drain_chunk(s, cnt, yi_c):
            yi_np = jax.device_get(yi_c)
            _wire_stats("dec_down_idx", yi_np)
            return [
                code_pool.submit(_dec_y_frame, s + j, yi_np[j])
                for j in range(cnt)
            ]

        try:
            # same bounded in-flight window as encode (ADVICE r3 #1): at most
            # max_inflight_chunks chunks hold device-resident means/symbols at
            # once — the oldest chunk is synthesized (freeing its handles)
            # before a new one is dispatched, so peak HBM is O(window)
            chunk_state = []  # (cnt, future->frame futures, means dev)
            recon_parts: List[List[jax.Array]] = []

            def _synthesize(cnt, futs_fut, mn_c):
                frames = [f.result() for f in futs_fut.result()]
                # pad rows mirror the encoder's edge-repeat padding
                frames.extend(frames[-1:] * (chunk - cnt))
                arr = np.stack(frames)  # rANS returns i32
                # i8 wire when the chunk's symbols fit (they essentially
                # always do for trained models), i16 otherwise — a 4x/2x cut
                # of the dominant host->device upload; jax.jit specializes
                # per input dtype so both variants stay cached
                if arr.size and -128 <= arr.min() and arr.max() <= 127:
                    arr = arr.astype(np.int8)
                else:
                    arr = arr.astype(np.int16)
                _wire_stats("dec_up_sym", arr)
                recon = synthesis(self.params, jnp.asarray(arr), mn_c)
                recon_parts.append([r[:cnt] for r in recon])

            for s, cnt in self._chunk_iter(n_frames, chunk):
                if len(chunk_state) >= self.max_inflight_chunks:
                    _synthesize(*chunk_state.pop(0))
                part = z_sym_all[s : s + cnt]
                if cnt < chunk:
                    part = np.concatenate(
                        [part, np.repeat(part[-1:], chunk - cnt, 0)]
                    )
                yi_c, mn_c = hyper_idx(self.params, jnp.asarray(part))
                chunk_state.append(
                    (cnt, drain_pool.submit(_drain_chunk, s, cnt, yi_c), mn_c)
                )
            for state in chunk_state:
                _synthesize(*state)
        finally:
            # idempotent on success; on error cancel queued work
            drain_pool.shutdown(wait=False, cancel_futures=True)
            code_pool.shutdown(wait=False, cancel_futures=True)
        if len(recon_parts) == 1:
            merged = recon_parts[0]
        else:
            merged = [
                jnp.concatenate([p[i] for p in recon_parts], axis=0)
                for i in range(len(names))
            ]
        # force execution with ONE fused scalar readback (the axon relay's
        # block_until_ready can return early; a 4-byte readback is the
        # reliable barrier). Summing one element per level ON DEVICE chains
        # every level into a single tiny program, so the barrier costs one
        # link round trip instead of one per level — on a ~37 ms RTT relay
        # that is 3 fewer RTTs per decode call. Timing stays honest,
        # tensors stay on device.
        _ = float(sum(r[0, 0, 0, 0] for r in merged))
        return {"data": dict(zip(names, merged))}

    def _decode_charm(
        self, z_sym_all, y_streams, names, shapes_hw, y_shape, n_frames,
        chunk, rate_idx, n_slices,
    ):
        """ChARM decode: per chunk, walk the channel slices sequentially —
        slice i's indexes come from the SAME _slice_idx_fn program the
        encoder ran on the same support (hyper + decoded slices [0,i)), so
        the streams stay in sync; per-slice host sync is inherent (indexes
        must exist before the slice can be entropy-decoded)."""
        y_h, y_w, y_c = y_shape
        cs = y_c // n_slices
        gc_table, _ = self._tables()
        hyper_support = self._hyper_support_fn((y_h, y_w))
        synthesis = self._syn_hat_fn(shapes_hw, rate_idx)

        recon_parts: List[List[jax.Array]] = []
        for s, cnt in self._chunk_iter(n_frames, chunk):
            part = z_sym_all[s : s + cnt]
            if cnt < chunk:
                part = np.concatenate([part, np.repeat(part[-1:], chunk - cnt, 0)])
            support0 = hyper_support(self.params, jnp.asarray(part))
            y_hat_parts = []
            for i in range(n_slices):
                sup = jnp.concatenate([support0] + y_hat_parts, axis=-1)
                yi_i, mn_i = self._slice_idx_fn(i)(self.params, sup)
                yi_np = np.asarray(yi_i)
                ys_np = np.empty((chunk, y_h, y_w, cs), np.int16)

                # frames are independent within a slice: fan the rANS
                # decodes over a pool (the C coder releases the GIL —
                # mirrors encode's pooling; VERDICT r2 item 5)
                def _dec_frame(j, i=i, s=s, yi_np=yi_np, ys_np=ys_np):
                    ys_np[j] = self._dec.decode_with_indexes(
                        y_streams[s + j][i], yi_np[j].ravel(),
                        gc_table.cdfs, gc_table.cdf_lengths, gc_table.offsets,
                    ).reshape(y_h, y_w, cs)

                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor() as pool:
                    list(pool.map(_dec_frame, range(cnt)))
                for j in range(cnt, chunk):  # pad rows mirror encoder's
                    ys_np[j] = ys_np[cnt - 1]
                # stays i16: this upload feeds the CONDITIONING chain
                # (dequant -> LRP -> next slice's indexes), which must run
                # the byte-identical compiled program on both sides — an i8
                # input would compile a different program and reopen the
                # 1-ulp fusion-drift desync the shared-program discipline
                # exists to prevent (the encoder feeds the same fn i16)
                y_hat_parts.append(
                    self._deq_slice_fn(i)(self.params, sup, jnp.asarray(ys_np), mn_i)
                )
            y_hat = jnp.concatenate(y_hat_parts, axis=-1)
            recon = synthesis(self.params, y_hat)
            recon_parts.append([r[:cnt] for r in recon])
        if len(recon_parts) == 1:
            merged = recon_parts[0]
        else:
            merged = [
                jnp.concatenate([p[i] for p in recon_parts], axis=0)
                for i in range(len(names))
            ]
        # single fused barrier (see the plain decode tail)
        _ = float(sum(r[0, 0, 0, 0] for r in merged))
        return {"data": dict(zip(names, merged))}

    @property
    def qp_value(self):
        return self.qp

    @property
    def eval_encode_type(self):
        return self.eval_encode
