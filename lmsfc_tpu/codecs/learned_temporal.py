"""Temporal L-MSFC codec plugin ("lmsfc-temporal").

Conditional latent coding for video feature sequences (BASELINE.json config:
temporal feature coding on TVD/HiEve): frame-parallel transforms + a
closed-loop entropy stage — each frame's gaussian params combine the
hyperprior with a predictor on the previous DECODED latent, resetting at
every intra period (GOP-aligned with the anchors).

GOP-BATCHED prediction: frames at the same offset within different GOPs are
independent (the chain resets at each intra frame), so the per-offset
predictor step runs as ONE device program over a GOP-sized batch — the
sequential depth is intra_period, not sequence length (8 steps for a
64-frame sequence at IP=8 instead of 64). The device-batched analogue of
the reference's GOP-parallel anchor encoding (ref std_codecs.py:204-255).

Bitstream 'LMFT' v2: header (levels/shapes/y/z geometry/intra_period) +
per-frame z and y rANS streams. Encoder and decoder run the identical
jitted GOP-batched predictor program, so rANS stays in sync (v1 streams
were coded with the batch-1 program and are refused rather than risking a
1-ulp cross-program drift).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.entropy_bottleneck import build_eb_cdf_table
from ..entropy.gaussian_conditional import GaussianConditional
from ..models.lmsfc_temporal import LMSFCv2Temporal
from ..native import RansDecoder, RansEncoder
from ..registry import register_codec
from ._jit_cache import MeshJitCache
from ..utils.readwrite import (
    read_bytes,
    read_uchars,
    read_uints,
    write_bytes,
    write_uchars,
    write_uints,
)

_MAGIC = b"LMFT"
_VERSION = 4  # v4: per-frame inter/intra MODE DECISION (header bitmask) —
# the encoder codes each non-keyframe with whichever entropy params cost
# fewer bits (conditional vs hyper-only), so a sequence the predictor can't
# help costs at most 1 bit/frame over the intra codec instead of losing;
# v3 made rANS payloads 4-way interleaved (native/rans.cpp);
# v2 added the GOP-batched predictor program (see module docstring)
_RANS_STREAMS = 4


@register_codec("lmsfc-temporal")
class LMSFCTemporalCodec(MeshJitCache):
    def __init__(
        self,
        vision_model: Any = None,
        dataset: Any = None,
        eval_encode: str = "bitrate",
        qp: Optional[int] = None,
        num_filters: int = 192,
        latent_filters: int = 192,
        hyper_filters: int = 128,
        out_channels: Sequence[int] = (256, 256, 256, 256),
        intra_period: int = 8,
        latent_stride_div: int = 2,
        checkpoint_dir: Optional[str] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
        dtype: str = "bfloat16",
        mesh=None,
        **kwargs,
    ):
        import logging

        self.logger = logging.getLogger(self.__class__.__name__)
        self.qp = qp
        self.eval_encode = eval_encode
        self.out_channels = tuple(out_channels)
        # rides the header as a u8: must fit one byte or the decoder's GOP
        # reset schedule diverges from the encoder's and rANS desyncs
        self.intra_period = int(intra_period)
        if not 1 <= self.intra_period <= 255:
            raise ValueError(f"intra_period must be in [1, 255], got {intra_period}")
        self.model = LMSFCv2Temporal(
            out_channels=self.out_channels,
            num_filters=num_filters,
            latent_filters=latent_filters,
            hyper_filters=hyper_filters,
            intra_period=self.intra_period,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
            latent_stride_div=int(latent_stride_div),
        )
        self._params = params
        self._params_on_device = False
        self._checkpoint_dir = checkpoint_dir
        self._seed = seed
        self._gaussian = GaussianConditional()
        self._tables_cache = None
        self._enc = RansEncoder(streams=_RANS_STREAMS)
        self._dec = RansDecoder(streams=_RANS_STREAMS)
        self._jit_cache: Dict = {}
        # optional dp mesh: analysis/hyper/synthesis shard the (padded)
        # frame axis, the GOP-batched predictor steps shard the GOP axis —
        # multi-chip video eval with the conditional chain intact
        self.mesh = mesh

    # ------------------------------------------------------------- params
    @property
    def params(self) -> Dict:
        if self._params is None:
            if self._checkpoint_dir is not None:
                from ..training.checkpoint import CheckpointManager

                restored = CheckpointManager(Path(self._checkpoint_dir)).restore()
                if restored is not None:
                    self._params = restored["params"]
            if self._params is None:
                self.logger.warning("no checkpoint; random temporal-codec params")
                feats = []
                h, w = 64, 64
                for c in self.out_channels:
                    feats.append(jnp.zeros((2, h, w, c), jnp.float32))
                    h, w = -(-h // 2), -(-w // 2)
                self._params = self.model.init(
                    {"params": jax.random.key(self._seed), "noise": jax.random.key(1)},
                    feats,
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
                jax.tree_util.tree_map(
                    np.asarray, self.params["base"]["entropy_bottleneck"]
                )
            )
            medians = np.asarray(
                self.params["base"]["entropy_bottleneck"]["quantiles"]
            )[:, 0, 1]
            gc = self._gaussian.cdf_table()
            self._tables_cache = (eb, medians, gc)
        return self._tables_cache

    # ------------------------------------------- jits (mixin: _cached_jit)
    # Wire discipline mirrors LMSFCCodec: every float that decides coding
    # state is derived ON DEVICE inside programs shared verbatim by encoder
    # and decoder; the host only moves integer symbol planes.
    def _analysis_fn(self, shapes):
        """fn(params, feats) -> (y f32, z_sym i16), device-resident."""

        def fn(params, feats):
            y, z = self.model.apply(
                {"params": params}, list(feats),
                method=LMSFCv2Temporal.analysis_latents_clip,
            )
            medians = params["base"]["entropy_bottleneck"]["quantiles"][:, 0, 1]
            z_sym = jnp.clip(
                jnp.round(z - medians[None, None, None, :]), -32768, 32767
            ).astype(jnp.int16)
            return y, z_sym

        return self._cached_jit(("ana", shapes), fn, arity=2)

    def _hyper_fn(self, y_hw):
        """fn(params, z_sym i16) -> (scales_h, means_h), device-resident.

        One standalone program shared by encode and decode: a fused variant
        could drift by 1 ulp at a scale-table boundary and flip an index,
        desyncing rANS (ADVICE r1 #2)."""

        def fn(params, z_sym):
            medians = params["base"]["entropy_bottleneck"]["quantiles"][:, 0, 1]
            z_hat = z_sym.astype(jnp.float32) + medians[None, None, None, :]
            return self.model.apply(
                {"params": params}, z_hat, y_hw,
                method=lambda m, z_, hw: m.base.h_s(z_, hw),
            )

        return self._cached_jit(("hyp", y_hw), fn, arity=2)

    def _pred_sel_fn(self, y_shape):
        """fn(params, y_prev, sh_t, mh_t, use_cond) -> (y_idx u8, means).

        The per-offset coding state over the GOP batch. `use_cond` is a
        per-GOP-row bool [G,1,1,1]: True = conditional (predictor-refined)
        entropy params, False = hyper-only (intra mode). BOTH branches are
        computed and selected with `where`, and this one program is shared
        verbatim by encoder and decoder (the flag travels in the bitstream
        header), so the rANS coding state stays bit-identical across the
        two sides whatever modes the encoder picked."""

        def fn(params, y_prev, sh, mh, use_cond):
            scales, means = self.model.apply(
                {"params": params}, y_prev, sh, mh,
                jnp.logical_not(use_cond),
                method=LMSFCv2Temporal.predict_params,
            )
            return GaussianConditional.build_indexes_device(scales), means

        return self._cached_jit(("pred", y_shape), fn, arity=5, layout="rdddd")

    def _mode_fn(self, y_shape):
        """Encoder-only rate probe: fn(params, y_prev, sh_t, mh_t, y_t) ->
        use_cond bool [G,1,1,1]. Estimates each GOP row's y bits under the
        conditional and the hyper-only gaussians (gaussian entropy of the
        quantized plane — a tight proxy for the rANS length) and returns
        True where the predictor actually helps. A decision, not coding
        state: it never has to match any decoder program bit-for-bit."""

        def fn(params, y_prev, sh, mh, y_t):
            def est_bits(is_intra):
                scales, means = self.model.apply(
                    {"params": params}, y_prev, sh, mh, jnp.asarray(is_intra),
                    method=LMSFCv2Temporal.predict_params,
                )
                y_hat = jnp.round(y_t - means) + means
                lk = jnp.maximum(
                    self._gaussian._likelihood(y_hat, scales, means), 1e-9
                )
                return -jnp.sum(
                    jnp.log2(lk).reshape(y_t.shape[0], -1), axis=1
                )

            use_cond = est_bits(False) < est_bits(True)
            return use_cond.reshape(-1, 1, 1, 1)

        return self._cached_jit(("mode", y_shape), fn, arity=5, layout="rdddd")

    def _sym_fn(self):
        """Encoder-only: fn(y_t, means) -> (y_sym8 i8, n_over i32[gops],
        y_sym i16). The i8 plane is the wire copy (half the download; see
        codecs/learned.py _sym_fn); the i16 plane stays device-resident for
        the closed-loop dequant AND as the exact fallback when a GOP row
        saturates i8."""

        def fn(y_t, means):
            s = jnp.clip(jnp.round(y_t - means), -32768, 32767).astype(jnp.int16)
            s8 = jnp.clip(s, -128, 127).astype(jnp.int8)
            over = jnp.sum(
                (s != s8.astype(jnp.int16)).reshape(s.shape[0], -1),
                axis=1, dtype=jnp.int32,
            )
            return s8, over, s

        return self._cached_jit(("sym",), fn, arity=2, repl_args=0)

    def _dequant_fn(self):
        """fn(y_sym i16, means) -> y_hat f32: the closed-loop reconstruction
        BOTH sides feed back as y_prev — shared program keeps the prediction
        chain bit-identical across encoder and decoder."""

        def fn(y_sym, means):
            return y_sym.astype(jnp.float32) + means

        return self._cached_jit(("deq",), fn, arity=2, repl_args=0)

    def _synthesis_fn(self, shapes_hw, t):
        """fn(params, y_hat_all) -> device-resident NCHW pyramid levels."""

        def fn(params, y_hat):
            recon = self.model.apply(
                {"params": params}, y_hat, shapes_hw,
                method=LMSFCv2Temporal.synthesis_clip,
            )
            return [jnp.transpose(r, (0, 3, 1, 2)) for r in recon]

        return self._cached_jit(("syn", shapes_hw, t), fn, arity=2)

    # -------------------------------------------------------------- encode
    def encode(self, input: Dict, codec_output_dir="", bitstream_name="sequence",
               file_prefix="", img_input=False) -> Dict:
        assert not img_input
        data = input["data"]
        names = list(data.keys())
        half_wire = self.model.dtype == jnp.bfloat16
        feats = []
        for v in data.values():
            if half_wire and isinstance(v, np.ndarray) and v.dtype == np.float32:
                v = v.astype(np.float16)  # see learned.py: bf16 superset
            feats.append(jnp.transpose(jnp.asarray(v), (0, 2, 3, 1)))
        n_frames = feats[0].shape[0]
        level_shapes = [(f.shape[3], f.shape[1], f.shape[2]) for f in feats]

        # pad the sequence to whole GOPs by edge-repeat: pad frames occupy
        # the TAIL offsets of the last GOP, so no real frame ever conditions
        # on one (batch independence of the transforms gives the decoder
        # bit-identical pad rows for z via its own edge-repeat)
        ip = self.intra_period
        n_gops = -(-n_frames // ip)
        t_pad = n_gops * ip
        if t_pad > n_frames:
            feats = [
                jnp.concatenate([f, jnp.repeat(f[-1:], t_pad - n_frames, axis=0)])
                for f in feats
            ]

        analysis = self._analysis_fn(tuple(f.shape for f in feats))
        y, z_sym_dev = analysis(self.params, feats)
        y_shape, z_shape = y.shape, z_sym_dev.shape  # metadata only
        eb, eb_medians, gc = self._tables()

        hyper = self._hyper_fn((y_shape[1], y_shape[2]))
        sh, mh = hyper(self.params, z_sym_dev)  # stay device-resident

        gop_shape = (n_gops,) + tuple(y_shape[1:])
        pred_sel = self._pred_sel_fn(gop_shape)
        mode = self._mode_fn(gop_shape)
        sym = self._sym_fn()
        dequant = self._dequant_fn()

        # GOP-batched closed loop: offset t of every GOP in one program call
        # (x[t::ip] gathers the GOP batch); the whole chain dispatches with
        # no host sync and only intra_period sequential steps
        handles = []  # per offset: (y_idx u8 (G,...), ..., use_cond bool)
        y_prev = self._dp_put(jnp.zeros(gop_shape, jnp.float32))
        all_intra = self._dp_put(jnp.zeros((n_gops, 1, 1, 1), bool))
        for t in range(ip):
            sh_t, mh_t = self._dp_put(sh[t::ip]), self._dp_put(mh[t::ip])
            y_off = self._dp_put(y[t::ip])
            # per-frame mode decision: keyframes (offset 0) are always
            # intra; other offsets code with whichever params cost less
            flags_t = (
                all_intra if t == 0
                else mode(self.params, y_prev, sh_t, mh_t, y_off)
            )
            yi_t, means_t = pred_sel(self.params, y_prev, sh_t, mh_t, flags_t)
            ys8_t, over_t, ys16_t = sym(y_off, means_t)
            y_prev = dequant(ys16_t, means_t)  # closed loop on device (exact)
            handles.append((yi_t, ys8_t, over_t, ys16_t, flags_t))

        # one batched round trip for every integer plane (separate fetches
        # each pay full link latency — see codecs/learned.py); the y planes
        # ride as i8 with per-GOP saturation counters, falling back to the
        # exact i16 plane for the rare offset that overflows
        flat = jax.device_get(
            [z_sym_dev]
            + [h[0] for h in handles]
            + [h[1] for h in handles]
            + [h[2] for h in handles]
            + [h[4] for h in handles]
        )
        z_sym = flat[0]
        yi_off = flat[1 : 1 + ip]
        ys_off = list(flat[1 + ip : 1 + 2 * ip])
        over_off = flat[1 + 2 * ip : 1 + 3 * ip]
        cond_off = flat[1 + 3 * ip :]
        # frame-order mode bitmask (pad frames stay 0/intra)
        mode_flags = np.zeros(t_pad, np.uint8)
        for off in range(ip):
            mode_flags[off::ip] = cond_off[off].reshape(-1).astype(np.uint8)
        for off in range(ip):
            if over_off[off].any():
                ys_off[off] = jax.device_get(handles[off][3])
        z_idx = np.broadcast_to(
            np.arange(z_shape[-1], dtype=np.int32), tuple(z_shape[1:])
        ).ravel()

        out_dir = Path(codec_output_dir) if codec_output_dir else Path(".")
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = f"{file_prefix}_" if file_prefix else ""
        path = out_dir / f"{stem}{bitstream_name}.bin"

        byte_sizes: List[float] = []
        with open(path, "wb") as fd:
            fd.write(_MAGIC)
            write_uchars(fd, (_VERSION, len(names), self.intra_period))
            write_uints(fd, (n_frames,))
            for name, (c, h, w) in zip(names, level_shapes):
                nb = name.encode("ascii")
                write_uchars(fd, (len(nb),))
                write_bytes(fd, nb)
                write_uints(fd, (c, h, w))
            write_uints(fd, (y_shape[1], y_shape[2], y_shape[3]))
            write_uints(fd, (z_shape[1], z_shape[2], z_shape[3]))
            write_bytes(fd, np.packbits(mode_flags).tobytes())
            header = fd.tell()

            for t in range(n_frames):
                g, off = divmod(t, ip)
                z_bytes = self._enc.encode_with_indexes(
                    z_sym[t].ravel(), z_idx, eb.cdfs, eb.cdf_lengths, eb.offsets
                )
                y_bytes = self._enc.encode_with_indexes(
                    ys_off[off][g].ravel(), yi_off[off][g].ravel(),
                    gc.cdfs, gc.cdf_lengths, gc.offsets,
                )
                write_uints(fd, (len(z_bytes),))
                write_bytes(fd, z_bytes)
                write_uints(fd, (len(y_bytes),))
                write_bytes(fd, y_bytes)
                byte_sizes.append(len(z_bytes) + len(y_bytes) + 8)

        per_frame_header = header / n_frames
        return {
            "bytes": [b + per_frame_header for b in byte_sizes],
            "bitstream": str(path),
            # per-frame mode decisions (1 = conditional/inter, 0 = intra);
            # diagnostic only — the decoder reads these from the header
            "mode_flags": [int(f) for f in mode_flags[:n_frames]],
        }

    # -------------------------------------------------------------- decode
    def decode(self, input, codec_output_dir="", file_prefix="", org_img_size=None,
               img_input=False) -> Dict:
        path = Path(input if isinstance(input, (str, Path)) else input["bitstream"])
        eb, eb_medians, gc = self._tables()
        with open(path, "rb") as fd:
            assert fd.read(4) == _MAGIC, "bad temporal-codec magic"
            version, n_levels, intra_period = read_uchars(fd, 3)
            if version != _VERSION:
                raise ValueError(
                    f"stream version {version} unsupported (current {_VERSION}); "
                    "pre-v4 LMFT streams predate the per-frame mode bitmask "
                    "and must be re-encoded"
                )
            (n_frames,) = read_uints(fd, 1)
            names, level_shapes = [], []
            for _ in range(n_levels):
                (ln,) = read_uchars(fd, 1)
                names.append(read_bytes(fd, ln).decode("ascii"))
                level_shapes.append(read_uints(fd, 3))
            y_h, y_w, y_c = read_uints(fd, 3)
            z_h, z_w, z_c = read_uints(fd, 3)
            t_pad_hdr = -(-n_frames // int(intra_period)) * int(intra_period)
            mode_flags = np.unpackbits(
                np.frombuffer(read_bytes(fd, -(-t_pad_hdr // 8)), np.uint8)
            )[:t_pad_hdr].astype(bool)
            streams = []
            for _ in range(n_frames):
                (zl,) = read_uints(fd, 1)
                zb = read_bytes(fd, zl)
                (yl,) = read_uints(fd, 1)
                yb = read_bytes(fd, yl)
                streams.append((zb, yb))

        z_idx = np.broadcast_to(np.arange(z_c, dtype=np.int32), (z_h, z_w, z_c)).ravel()
        # hyper params frame-parallel from decoded z; pad to whole GOPs by
        # edge-repeat — bit-identical to the encoder's pad rows (its padded
        # FEATURE frames were edge-repeats, and the transforms are
        # batch-independent, so its padded z rows equal the last real row)
        ip = int(intra_period)
        n_gops = -(-n_frames // ip)
        t_pad = n_gops * ip
        z_sym_all = np.empty((t_pad, z_h, z_w, z_c), np.int16)
        for t, (zb, _) in enumerate(streams):
            z_sym_all[t] = self._dec.decode_with_indexes(
                zb, z_idx, eb.cdfs, eb.cdf_lengths, eb.offsets
            ).reshape(z_h, z_w, z_c)
        z_sym_all[n_frames:] = z_sym_all[n_frames - 1]

        hyper = self._hyper_fn((y_h, y_w))
        sh, mh = hyper(self.params, jnp.asarray(z_sym_all))

        pred_sel = self._pred_sel_fn((n_gops, y_h, y_w, y_c))
        dequant = self._dequant_fn()
        # GOP-batched chain: one predictor call per OFFSET (not per frame);
        # the per-offset host sync is inherent to conditional coding, but
        # its depth is now intra_period, not sequence length. Pad rows only
        # exist in the TAIL offsets of the last GOP and never condition a
        # real frame, so their symbols can be anything (zeros).
        y_hat_offsets = []
        y_prev = self._dp_put(jnp.zeros((n_gops, y_h, y_w, y_c), jnp.float32))
        for off in range(ip):
            flags = self._dp_put(
                jnp.asarray(mode_flags[off::ip].reshape(-1, 1, 1, 1))
            )
            yi_t, means_t = pred_sel(
                self.params, y_prev,
                self._dp_put(sh[off::ip]), self._dp_put(mh[off::ip]), flags,
            )
            yi_np = np.asarray(yi_t)
            ys_np = np.zeros((n_gops, y_h, y_w, y_c), np.int16)
            for g in range(n_gops):
                f = g * ip + off
                if f < n_frames:
                    ys_np[g] = self._dec.decode_with_indexes(
                        streams[f][1], yi_np[g].ravel(),
                        gc.cdfs, gc.cdf_lengths, gc.offsets,
                    ).reshape(y_h, y_w, y_c)
            y_prev = dequant(self._dp_put(jnp.asarray(ys_np)), means_t)
            y_hat_offsets.append(y_prev)

        # reassemble frame order: y_hat[g*ip+off] = y_hat_offsets[off][g]
        y_hat_all = jnp.stack(y_hat_offsets, axis=1).reshape(
            t_pad, y_h, y_w, y_c
        )[:n_frames]
        shapes_hw = tuple((h, w) for (_, h, w) in level_shapes)
        synthesis = self._synthesis_fn(shapes_hw, n_frames)
        recon = synthesis(self.params, y_hat_all)
        # single fused scalar-readback barrier: one link round trip instead
        # of one per level (see codecs/learned.py decode tail)
        _ = float(sum(r[0, 0, 0, 0] for r in recon))
        return {"data": dict(zip(names, recon))}

    @property
    def qp_value(self):
        return self.qp

    @property
    def eval_encode_type(self):
        return self.eval_encode
