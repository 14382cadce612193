"""Anchor codecs: VTM / HM / VVenC subprocess wrappers with GOP-parallel encode.

Re-creation of compressai_vision/codecs/std_codecs.py:72-837:

  encode: feature pyramid -> single-channel frame mosaic (ops.tiling) ->
  exact 10-bit min-max quantization (dataset-global min/max, codecs/
  utils.py:42-46) -> YUV400_10le file -> encoder subprocess; sequences are
  chopped into intra-period GOP chunks encoded in parallel over a thread
  pool and merged with parcat (ref std_codecs.py:204-274). A self-decodable
  header (bitdepth, level geometry, min/max) is prepended — replacing the
  reference's fpn-sizes JSON sideband (std_codecs.py:599-613) with in-band
  signalling.

  decode: header -> decoder subprocess -> YUV read -> inverse normalization
  -> un-tiling back to the feature pyramid.

Binary paths come from codec settings; the classes only differ in command
-line construction (HM/VVenC subclass VTM, ref std_codecs.py:685-837).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.quant import min_max_inv_normalization, min_max_normalization
from ..ops.tiling import pack_feature_dict_to_frames, unpack_frames_to_feature_dict
from ..registry import register_codec
from ..utils.external_exec import run_cmdline, run_cmdlines_parallel
from ..utils.readwrite import (
    read_bytes,
    read_uchars,
    read_uints,
    read_float32,
    write_bytes,
    write_float32,
    write_uchars,
    write_uints,
)
from ..utils.yuv import YUVReader, YUVWriter
from .base import BaseCodec

_HDR_MAGIC = b"FCMA"


class _ImageModeMixin:
    """Image-domain (remote-inference) coding: BGR frames <-> YUV420 codec.

    Ref std_codecs.py:292-355 converts PNGs to YUV420 via ffmpeg; here the
    conversion is in-process numpy (utils/color.py), same codec subprocess.
    """

    def _encode_images(self, input: Dict, out_dir: Path, bitstream_name: str, stem: str) -> Dict:
        from ..utils.color import bgr_to_yuv420

        frames = np.asarray(input["data"]["frames"])  # [N,H,W,3] uint8
        n, h, w = frames.shape[:3]
        h2, w2 = h - h % 2, w - w % 2  # 420 needs even dims
        yuv_path = out_dir / f"{stem}{bitstream_name}.yuv"
        with YUVWriter(yuv_path, w2, h2, "yuv420_10le") as wr:
            for f in range(n):
                y, u, v = bgr_to_yuv420(frames[f, :h2, :w2], self.bitdepth)
                wr.write_frame(y, u, v)

        payload = out_dir / f"{stem}{bitstream_name}.codec.bin"
        cmd = self.get_encode_cmd_img(yuv_path, payload, w2, h2, n)
        run_cmdline(cmd, out_dir / f"{stem}{bitstream_name}_enc.log")

        final = out_dir / f"{stem}{bitstream_name}.bin"
        with open(final, "wb") as fd:
            fd.write(b"FCMI")
            write_uchars(fd, (self.bitdepth,))
            write_uints(fd, (n, h, w))
            with open(payload, "rb") as pf:
                shutil.copyfileobj(pf, fd)
        total = final.stat().st_size
        return {"bytes": [total / n] * n, "bitstream": str(final)}

    def get_encode_cmd_img(self, yuv: Path, out_bin: Path, w: int, h: int, n_frames: int) -> List[str]:
        cmd = [
            self.encoder_path, "-i", str(yuv), "-b", str(out_bin),
            "-wdt", str(w), "-hgt", str(h),
            "-fr", str(self.frame_rate), "-f", str(n_frames),
            "-q", str(self.qp),
            "--InputBitDepth=10", "--InternalBitDepth=10",
            "--InputChromaFormat=420",
            f"--IntraPeriod={self.intra_period if self.intra_period > 0 else n_frames}",
            "--DecodingRefreshType=2", "--Level=5.1",
        ]
        if self.cfg_file:
            cmd = cmd[:1] + ["-c", self.cfg_file] + cmd[1:]
        return cmd

    def _decode_images(self, path: Path, out_dir: Path) -> Dict:
        from ..utils.color import yuv420_to_bgr

        with open(path, "rb") as fd:
            assert fd.read(4) == b"FCMI", "bad image-mode header"
            (bitdepth,) = read_uchars(fd, 1)
            n, h, w = read_uints(fd, 3)
            payload = fd.read()
        raw_bin = out_dir / f"{path.stem}_payload.bin"
        raw_bin.write_bytes(payload)
        yuv_out = out_dir / f"{path.stem}_dec.yuv"
        run_cmdline(self.get_decode_cmd(raw_bin, yuv_out), out_dir / f"{path.stem}_dec.log")

        h2, w2 = h - h % 2, w - w % 2
        reader = YUVReader(yuv_out, w2, h2, "yuv420_10le")
        frames = []
        for y, u, v in reader.frames():
            bgr = yuv420_to_bgr(y, u, v, bitdepth)
            if (h2, w2) != (h, w):  # pad back removed edge pixels
                bgr = np.pad(bgr, ((0, h - h2), (0, w - w2), (0, 0)), mode="edge")
            frames.append(bgr)
        return {"data": {"frames": np.stack(frames[:n])}}



@register_codec("vtm")
class VTM(_ImageModeMixin, BaseCodec):
    def __init__(
        self,
        encoder_path: str = "EncoderAppStatic",
        decoder_path: str = "DecoderAppStatic",
        parcat_path: str = "parcatStatic",
        cfg_file: Optional[str] = None,
        qp: int = 37,
        intra_period: int = 1,
        frame_rate: int = 30,
        parallel_encoding: bool = True,
        bitdepth: int = 10,
        min_max_override: Optional[Tuple[float, float]] = None,
        **kwargs,
    ):
        super().__init__(qp=qp, **kwargs)
        self.encoder_path = encoder_path
        self.decoder_path = decoder_path
        self.parcat_path = parcat_path
        self.cfg_file = cfg_file
        self.intra_period = intra_period
        self.frame_rate = frame_rate
        self.parallel_encoding = parallel_encoding
        self.bitdepth = bitdepth
        self._min_max_override = min_max_override

    # ----------------------------------------------------------- min / max
    def _min_max(self) -> Tuple[float, float]:
        if self._min_max_override is not None:
            return tuple(self._min_max_override)
        catalog = getattr(self.dataset, "catalog", None)
        mm = getattr(catalog, "min_max", None)
        if mm is None:
            raise ValueError("no dataset min/max for anchor packing; set min_max_override")
        return mm

    # --------------------------------------------------------- commandlines
    def get_encode_cmd(
        self, yuv: Path, out_bin: Path, w: int, h: int, n_frames: int, intra_period: int
    ) -> List[str]:
        """VTM EncoderApp args (ref std_codecs.py:154-255)."""
        cmd = [
            self.encoder_path,
            "-i", str(yuv),
            "-b", str(out_bin),
            "-wdt", str(w),
            "-hgt", str(h),
            "-fr", str(self.frame_rate),
            "-f", str(n_frames),
            "-q", str(self.qp),
            "--InputBitDepth=10",
            "--InternalBitDepth=10",
            "--InputChromaFormat=400",
            "--FrameSkip=0",
            f"--IntraPeriod={intra_period}",
            "--DecodingRefreshType=2",
            "--Level=5.1",
            "-dph", "1",
        ]
        if self.cfg_file:
            cmd = cmd[:1] + ["-c", self.cfg_file] + cmd[1:]
        return cmd

    def get_decode_cmd(self, bin_path: Path, yuv_out: Path) -> List[str]:
        return [
            self.decoder_path, "-b", str(bin_path), "-o", str(yuv_out),
            "-d", str(self.bitdepth),
        ]

    def get_parcat_cmd(self, chunks: Sequence[Path], out_bin: Path) -> List[str]:
        return [self.parcat_path, *[str(c) for c in chunks], str(out_bin)]

    # --------------------------------------------------------------- encode
    def encode(
        self,
        input: Dict,
        codec_output_dir: str = "",
        bitstream_name: str = "bitstream",
        file_prefix: str = "",
        img_input: bool = False,
    ) -> Dict:
        out_dir = Path(codec_output_dir) if codec_output_dir else Path(".")
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = f"{file_prefix}_" if file_prefix else ""
        if img_input:
            return self._encode_images(input, out_dir, bitstream_name, stem)

        data = {k: np.asarray(v) for k, v in input["data"].items()}
        level_shapes = {k: v.shape for k, v in data.items()}
        chans = [v.shape[1] for v in data.values()]
        anchor = "first" if len(set(chans)) == 1 else "widest"

        packed, feature_size, subframe_heights = pack_feature_dict_to_frames(
            {k: jnp.asarray(v) for k, v in data.items()}, anchor=anchor
        )
        dump_fpn_sizes_json(
            feature_size, subframe_heights,
            out_dir / f"{stem}{bitstream_name}_fpn-sizes.json",
        )
        packed = np.asarray(packed)
        n_frames, frm_h, frm_w = packed.shape
        minv, maxv = self._min_max()
        q, mid_level = min_max_normalization(
            jnp.asarray(packed), minv, maxv, self.bitdepth
        )
        q = np.asarray(q).astype(np.uint16)

        yuv_path = out_dir / f"{stem}{bitstream_name}.yuv"
        with YUVWriter(yuv_path, frm_w, frm_h, "yuv400_10le") as wr:
            for f in range(n_frames):
                wr.write_frame(q[f])

        payload = out_dir / f"{stem}{bitstream_name}.vtm.bin"
        logp = out_dir / f"{stem}{bitstream_name}_enc.log"
        intra_period = self.intra_period if self.intra_period > 0 else n_frames

        if self.parallel_encoding and n_frames > intra_period > 0:
            # GOP-parallel: one encoder process per intra-period chunk
            chunk_bins = []
            cmds = []
            starts = list(range(0, n_frames, intra_period))
            for ci, s in enumerate(starts):
                cnt = min(intra_period, n_frames - s)
                cyuv = out_dir / f"{stem}{bitstream_name}_chunk{ci}.yuv"
                _slice_yuv(yuv_path, cyuv, frm_w, frm_h, s, cnt)
                cbin = out_dir / f"{stem}{bitstream_name}_chunk{ci}.bin"
                chunk_bins.append(cbin)
                cmds.append(self.get_encode_cmd(cyuv, cbin, frm_w, frm_h, cnt, intra_period))
            run_cmdlines_parallel(cmds, logp)
            run_cmdline(self.get_parcat_cmd(chunk_bins, payload), logp)
        else:
            run_cmdline(
                self.get_encode_cmd(yuv_path, payload, frm_w, frm_h, n_frames, intra_period),
                logp,
            )
        assert payload.exists() and payload.stat().st_size > 0, "encoder produced no bitstream"

        # prepend self-decodable header (ref std_codecs.py:629-647 writes
        # nbit/frame-geometry/min-max; we add level names+shapes in-band)
        final = out_dir / f"{stem}{bitstream_name}.bin"
        with open(final, "wb") as fd:
            fd.write(_HDR_MAGIC)
            write_uchars(fd, (self.bitdepth, len(data)))
            write_uints(fd, (n_frames, frm_h, frm_w))
            write_float32(fd, (float(minv), float(maxv)))
            for name in data:
                nb = name.encode("ascii")
                write_uchars(fd, (len(nb),))
                write_bytes(fd, nb)
                _, c, h, w = level_shapes[name]
                write_uints(fd, (c, h, w, subframe_heights[name]))
            with open(payload, "rb") as pf:
                shutil.copyfileobj(pf, fd)

        total = final.stat().st_size
        return {"bytes": [total / n_frames] * n_frames, "bitstream": str(final)}

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
        out_dir = Path(codec_output_dir) if codec_output_dir else path.parent
        if img_input:
            return self._decode_images(path, out_dir)

        with open(path, "rb") as fd:
            assert fd.read(4) == _HDR_MAGIC, "bad anchor header"
            bitdepth, n_levels = read_uchars(fd, 2)
            n_frames, frm_h, frm_w = read_uints(fd, 3)
            minv, maxv = read_float32(fd, 2)
            names, feature_size, subframe_heights = [], {}, {}
            for _ in range(n_levels):
                (ln,) = read_uchars(fd, 1)
                name = read_bytes(fd, ln).decode("ascii")
                c, h, w, sh = read_uints(fd, 4)
                names.append(name)
                feature_size[name] = (1, c, h, w)
                subframe_heights[name] = sh
            payload = fd.read()

        raw_bin = out_dir / f"{path.stem}_payload.bin"
        raw_bin.write_bytes(payload)
        yuv_out = out_dir / f"{path.stem}_dec.yuv"
        run_cmdline(
            self.get_decode_cmd(raw_bin, yuv_out), out_dir / f"{path.stem}_dec.log"
        )

        reader = YUVReader(yuv_out, frm_w, frm_h, "yuv400_10le")
        frames = np.stack([y for y, _, _ in reader.frames()])[:n_frames]
        deq = min_max_inv_normalization(
            jnp.asarray(frames.astype(np.float32)), minv, maxv, bitdepth
        )
        feats = unpack_frames_to_feature_dict(deq, feature_size, subframe_heights)
        return {"data": feats}


@register_codec("hm")
class HM(VTM):
    """HEVC reference software (ref std_codecs.py:685-794)."""

    def __init__(self, encoder_path="TAppEncoderStatic", decoder_path="TAppDecoderStatic",
                 parcat_path="parcatHM", **kwargs):
        super().__init__(
            encoder_path=encoder_path, decoder_path=decoder_path,
            parcat_path=parcat_path, **kwargs,
        )

    def get_encode_cmd(self, yuv, out_bin, w, h, n_frames, intra_period):
        cmd = [
            self.encoder_path,
            "-i", str(yuv), "-b", str(out_bin),
            "-wdt", str(w), "-hgt", str(h),
            "-fr", str(self.frame_rate), "-f", str(n_frames),
            "-q", str(self.qp),
            "--InputBitDepth=10", "--InternalBitDepth=10",
            "--InputChromaFormat=400",
            f"--IntraPeriod={intra_period}",
            "--DecodingRefreshType=2",
            "--Level=5.1", "--SEIDecodedPictureHash=1",
        ]
        if self.cfg_file:
            cmd = cmd[:1] + ["-c", self.cfg_file] + cmd[1:]
        return cmd


@register_codec("vvenc")
class VVENC(VTM):
    """vvenc/vvdec fast VVC (ref std_codecs.py:797-837)."""

    def __init__(self, encoder_path="vvencapp", decoder_path="vvdecapp",
                 preset: str = "medium", **kwargs):
        super().__init__(encoder_path=encoder_path, decoder_path=decoder_path, **kwargs)
        self.preset = preset

    def get_encode_cmd(self, yuv, out_bin, w, h, n_frames, intra_period):
        return [
            self.encoder_path,
            "-i", str(yuv), "-o", str(out_bin),
            "-s", f"{w}x{h}",
            "-r", str(self.frame_rate),
            "-f", str(n_frames),
            "-q", str(self.qp),
            "--preset", self.preset,
            "-c", "yuv400_10",
            "--refreshsec", str(max(1, intra_period // max(self.frame_rate, 1))),
        ]

    def get_decode_cmd(self, bin_path, yuv_out):
        return [self.decoder_path, "-b", str(bin_path), "-o", str(yuv_out)]


def dump_fpn_sizes_json(
    feature_size: Dict[str, Tuple[int, int, int, int]],
    subframe_heights: Dict[str, int],
    path: Path,
) -> None:
    """Write the reference-compatible fpn-sizes sideband JSON
    ({"fpn": {level: [N,C,H,W]}, "subframe_heights": {level: h}} — ref
    std_codecs.py:672-682, data/mpeg-fcm/*/fpn-sizes/*.json). Our bitstreams
    are self-decodable, but the sideband lets reference-style decoders
    consume anchors produced here.
    """
    import json

    payload = {
        "fpn": {k: list(v) for k, v in feature_size.items()},
        "subframe_heights": {k: int(v) for k, v in subframe_heights.items()},
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(payload, indent=4))


def _slice_yuv(src: Path, dst: Path, w: int, h: int, start: int, count: int) -> None:
    frame_bytes = w * h * 2  # 10-bit le
    with open(src, "rb") as f, open(dst, "wb") as g:
        f.seek(start * frame_bytes)
        g.write(f.read(count * frame_bytes))
