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
        logp = out_dir / f"{stem}{bitstream_name}_enc.log"
        intra_period = self.intra_period if self.intra_period > 0 else n
        cmds = self.get_encode_cmd(
            yuv_path, payload, w2, h2, n, intra_period, chroma_format="420"
        )
        if len(cmds) == 1:
            run_cmdline(cmds[0], logp)
        else:
            run_cmdlines_parallel(cmds, logp)
            parts = [
                Path(a.split("=", 1)[1])
                for cmd in cmds
                for a in cmd
                if a.startswith("--BitstreamFile=")
            ]
            run_cmdline(self.get_parcat_cmd(parts, payload), logp)

        final = out_dir / f"{stem}{bitstream_name}.bin"
        with open(final, "wb") as fd:
            fd.write(b"FCMI")
            write_uchars(fd, (self.bitdepth,))
            write_uints(fd, (n, h, w))
            with open(payload, "rb") as pf:
                shutil.copyfileobj(pf, fd)
        total = final.stat().st_size
        return {"bytes": [total / n] * n, "bitstream": str(final)}

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
    # raw format of the packed feature frames fed to the encoder binary;
    # x264/x265 override to yuv444_10le (ref codecs/ffmpeg.py:142-157)
    feature_yuv_format = "yuv400_10le"

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
        hash_check: int = 1,
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
        # md5 decoded-picture hash (-dph); MPEG anchor configs enable it
        # (ref cfgs/codec/vtm.yaml:24 hash_check: 1)
        self.hash_check = hash_check
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
    _VERBOSITY_FLAGS = ("-v", "6")  # VTM only; HM has no -v (ref :717-741)

    def _hash_flags(self) -> List[str]:
        return ["-dph", str(self.hash_check)]

    def get_encode_cmd(
        self, yuv: Path, out_bin: Path, w: int, h: int, n_frames: int, intra_period: int,
        chroma_format: str = "400",
    ) -> List[List[str]]:
        """VTM EncoderApp cmdline(s), flags matching the MPEG anchor exactly
        (ref std_codecs.py:154-255): -ts 1, -v 6, Level 5.1 (video) / 6.2
        (stills), ConformanceWindowMode=1, DecodingRefreshType=1 iff
        intra_period>=1, -o /dev/null. Returns one cmdline, or several for
        GOP-parallel encoding: chunks of intra_period+1 frames selected by
        --FrameSkip on the shared YUV, parts named -part-{e:03d}, merged by
        parcat (ref :204-255)."""
        level = 5.1 if n_frames > 1 else 6.2  # MPEG anchor rule
        decoding_refresh_type = 1 if intra_period >= 1 else 0
        base = [self.encoder_path, "-i", str(yuv)]
        if self.cfg_file:
            base += ["-c", str(self.cfg_file)]
        base += [
            "-q", str(self.qp),
            "-o", "/dev/null",
            "-wdt", str(w),
            "-hgt", str(h),
            "-fr", str(self.frame_rate),
            # temporal subsampling 1: prevents the default period of 8 in
            # all-intra configs (ref :189-190)
            "-ts", "1",
            *self._VERBOSITY_FLAGS,
            f"--Level={level}",
            f"--IntraPeriod={intra_period}",
            f"--InputChromaFormat={chroma_format}",
            f"--InputBitDepth={self.bitdepth}",
            f"--InternalBitDepth={self.bitdepth}",
            "--ConformanceWindowMode=1",
            *self._hash_flags(),
            f"--DecodingRefreshType={decoding_refresh_type}",
        ]
        if not self.parallel_encoding or n_frames <= intra_period + 1:
            return [base + [f"--BitstreamFile={out_bin}", f"--FramesToBeEncoded={n_frames}"]]
        # GOP-parallel (ref :211-255); chunks while frames remain — the ref's
        # round(n/ip + 0.5) chunk count can add a 0-frame part when n is an
        # even multiple of ip (banker's rounding); this loop is otherwise
        # identical and never emits an empty encode
        out_bin = Path(out_bin)
        cmds, skip, remaining, e = [], 0, n_frames, 0
        while remaining > 0:
            count = min(remaining, intra_period + 1)
            part = out_bin.parent / f"{out_bin.stem}-part-{e:03d}{out_bin.suffix}"
            cmds.append(base + [
                f"--BitstreamFile={part}",
                f"--FrameSkip={skip}",
                f"--FramesToBeEncoded={count}",
            ])
            skip += intra_period
            remaining -= intra_period
            e += 1
        return cmds

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
        fmt = self.feature_yuv_format
        neutral = None
        if fmt.startswith("yuv444"):
            # x264/x265 feature path packs into Y of yuv444p10le with
            # neutral chroma (ref codecs/ffmpeg.py:142-157)
            neutral = np.full((frm_h, frm_w), 1 << (self.bitdepth - 1), q.dtype)
        with YUVWriter(yuv_path, frm_w, frm_h, fmt) as wr:
            for f in range(n_frames):
                if neutral is None:
                    wr.write_frame(q[f])
                else:
                    wr.write_frame(q[f], neutral, neutral)

        payload = out_dir / f"{stem}{bitstream_name}.vtm.bin"
        logp = out_dir / f"{stem}{bitstream_name}_enc.log"
        intra_period = self.intra_period if self.intra_period > 0 else n_frames

        cmds = self.get_encode_cmd(
            yuv_path, payload, frm_w, frm_h, n_frames, intra_period
        )
        if len(cmds) == 1:
            run_cmdline(cmds[0], logp)
        else:
            # GOP-parallel encode over the thread pool, then parcat merge
            # (ref std_codecs.py:204-274)
            run_cmdlines_parallel(cmds, logp)
            parts = [
                Path(a.split("=", 1)[1])
                for cmd in cmds
                for a in cmd
                if a.startswith("--BitstreamFile=")
            ]
            run_cmdline(self.get_parcat_cmd(parts, payload), logp)
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

        reader = YUVReader(yuv_out, frm_w, frm_h, self.feature_yuv_format)
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

    # HM's EncoderApp takes neither -v nor -dph: the reference HM cmdline
    # (std_codecs.py:717-741) is the VTM one minus those two flags; the
    # GOP-parallel FrameSkip logic is shared verbatim.
    _VERBOSITY_FLAGS = ()

    def _hash_flags(self) -> List[str]:
        return []


@register_codec("vvenc")
class VVENC(VTM):
    """vvenc/vvdec fast VVC (ref std_codecs.py:797-837)."""

    def __init__(self, encoder_path="vvencapp", decoder_path="vvdecapp",
                 preset: str = "fast", **kwargs):
        super().__init__(encoder_path=encoder_path, decoder_path=decoder_path, **kwargs)
        self.preset = preset

    def get_encode_cmd(self, yuv, out_bin, w, h, n_frames, intra_period,
                       chroma_format: str = "400"):
        """vvencapp args matching ref std_codecs.py:808-836 exactly
        (yuv420_10 input — vvencapp has no 400 mode — no GOP-parallel)."""
        return [[
            self.encoder_path,
            "-i", str(yuv),
            "-q", str(self.qp),
            "--output", str(out_bin),
            "--size", f"{w}x{h}",
            "--framerate", str(self.frame_rate),
            "--frames", str(n_frames),
            "--format", "yuv420_10",
            "--preset", str(self.preset),
        ]]

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


