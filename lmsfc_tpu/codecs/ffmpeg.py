"""x264/x265 anchors via the ffmpeg CLI (CRF mode).

Re-creation of compressai_vision/codecs/ffmpeg.py:53-363: features are
packed into YUV444/400 10-bit frames and crushed by libx264/libx265; same
min-max normalization + in-band header as the VTM path (the reference used
an fpn-sizes JSON sideband). Binary availability is environment-dependent —
these classes build the commandlines and defer to the subprocess runner.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

from ..registry import register_codec
from .std_codecs import VTM


@register_codec("x264")
class X264(VTM):
    # ref codecs/ffmpeg.py:142-157 declares yuv444p10le for the feature path
    feature_yuv_format = "yuv444_10le"

    def __init__(self, ffmpeg_path: str = "ffmpeg", crf: int = 28, preset: str = "medium",
                 tune: str = "psnr", threads: int = 4, **kwargs):
        kwargs.setdefault("qp", crf)
        super().__init__(**kwargs)
        self.ffmpeg_path = ffmpeg_path
        self.crf = crf
        self.preset = preset
        self.tune = tune
        self.threads = threads
        self.parallel_encoding = False  # ffmpeg threads internally (ref :144-145)
        self.vcodec = "h264"

    def get_encode_cmd(self, yuv: Path, out_bin: Path, w: int, h: int,
                       n_frames: int, intra_period: int,
                       chroma_format: str = "444") -> List[List[str]]:
        """ffmpeg CRF cmdline matching ref codecs/ffmpeg.py:114-147 (-bf 0,
        yuv444p10le, -threads 4); input raw format declared explicitly so
        the pipe is unambiguous (the reference relies on ffmpeg defaults)."""
        frm_rate = self.frame_rate if n_frames > 1 else 1
        return [[
            self.ffmpeg_path, "-y",
            "-f", "rawvideo", "-pix_fmt", "yuv444p10le",
            "-s:v", f"{w}x{h}",
            "-framerate", str(frm_rate),
            "-i", str(yuv),
            "-c:v", self.vcodec,
            "-crf", str(self.crf),
            "-preset", self.preset,
            "-bf", "0",
            "-tune", self.tune,
            "-pix_fmt", "yuv444p10le",
            "-threads", str(self.threads),
            str(out_bin),
        ]]

    def get_decode_cmd(self, bin_path: Path, yuv_out: Path) -> List[str]:
        # ref codecs/ffmpeg.py:149-160
        return [
            self.ffmpeg_path, "-y",
            "-i", str(bin_path),
            "-pix_fmt", "yuv444p10le",
            "-f", "rawvideo", str(yuv_out),
        ]


@register_codec("x265")
class X265(X264):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.vcodec = "hevc"

    def get_encode_cmd(self, yuv: Path, out_bin: Path, w: int, h: int,
                       n_frames: int, intra_period: int,
                       chroma_format: str = "444") -> List[List[str]]:
        """ref codecs/ffmpeg.py:330-363: hevc, bframes=0 via -x265-params,
        output pix_fmt gray10le (sic — the reference writes 444 input but
        declares gray output; flags reproduced as-is)."""
        frm_rate = self.frame_rate if n_frames > 1 else 1
        return [[
            self.ffmpeg_path, "-y",
            "-f", "rawvideo", "-pix_fmt", "yuv444p10le",
            "-s:v", f"{w}x{h}",
            "-framerate", str(frm_rate),
            "-i", str(yuv),
            "-c:v", self.vcodec,
            "-crf", str(self.crf),
            "-preset", self.preset,
            "-x265-params", "bframes=0",
            "-tune", self.tune,
            "-pix_fmt", "gray10le",
            "-threads", str(self.threads),
            str(out_bin),
        ]]
