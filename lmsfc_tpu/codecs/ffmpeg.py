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
        self.vcodec = "libx264"

    def get_encode_cmd(self, yuv: Path, out_bin: Path, w: int, h: int,
                       n_frames: int, intra_period: int) -> List[str]:
        return [
            self.ffmpeg_path, "-y", "-hide_banner",
            "-f", "rawvideo", "-pix_fmt", "gray10le",
            "-s", f"{w}x{h}", "-r", str(self.frame_rate),
            "-i", str(yuv),
            "-c:v", self.vcodec,
            "-crf", str(self.crf),
            "-preset", self.preset,
            "-tune", self.tune,
            "-g", str(intra_period),
            "-threads", str(self.threads),
            "-f", "mpegts", str(out_bin),
        ]

    def get_decode_cmd(self, bin_path: Path, yuv_out: Path) -> List[str]:
        return [
            self.ffmpeg_path, "-y", "-hide_banner",
            "-i", str(bin_path),
            "-f", "rawvideo", "-pix_fmt", "gray10le",
            str(yuv_out),
        ]


@register_codec("x265")
class X265(X264):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.vcodec = "libx265"
