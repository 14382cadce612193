"""Raw-video metadata parsing + memory-mapped sequence access.

Mirrors compressai_vision/codecs/encdec_utils/rawvideo.py:38-320:
`get_raw_video_file_info` parses `<name>_<W>x<H>_<fps>[_<bitdepth>bit]
[_p420].yuv`-style filenames; `RawVideoSequence` memory-maps a raw planar
file for random frame access.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .yuv import _FORMATS, frame_size_bytes

_PATTERN = re.compile(
    r"(?P<name>.+?)[_-](?P<width>\d+)x(?P<height>\d+)[_-](?P<fps>\d+(?:\.\d+)?)"
    r"(?:fps)?(?:[_-](?P<bitdepth>\d+)bit)?(?:[_-]p?(?P<chroma>40[024]))?",
)


def get_raw_video_file_info(stem: str) -> Dict:
    m = _PATTERN.match(stem)
    if not m:
        raise ValueError(f"cannot parse raw-video info from {stem!r}")
    d = m.groupdict()
    bitdepth = int(d["bitdepth"]) if d["bitdepth"] else 8
    chroma = d["chroma"] or "420"
    fmt = f"yuv{chroma}" + ("_10le" if bitdepth == 10 else "")
    return {
        "name": d["name"],
        "width": int(d["width"]),
        "height": int(d["height"]),
        "fps": float(d["fps"]),
        "bitdepth": bitdepth,
        "format": fmt,
    }


class RawVideoSequence:
    """Memory-mapped random access into a raw planar YUV file."""

    def __init__(self, path: Path, width: Optional[int] = None,
                 height: Optional[int] = None, fmt: Optional[str] = None):
        self.path = Path(path)
        if width is None or height is None or fmt is None:
            info = get_raw_video_file_info(self.path.stem)
            width, height, fmt = info["width"], info["height"], info["format"]
        self.width, self.height, self.fmt = width, height, fmt
        self._frame_bytes = frame_size_bytes(width, height, fmt)
        self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")
        self.n_frames = self._mmap.size // self._frame_bytes

    def __len__(self) -> int:
        return self.n_frames

    def __getitem__(self, idx: int) -> np.ndarray:
        """Luma plane of frame idx (the feature-coding path is luma-only)."""
        mode, dtype = _FORMATS[self.fmt]
        start = idx * self._frame_bytes
        luma_bytes = self.width * self.height * np.dtype(dtype).itemsize
        buf = self._mmap[start : start + luma_bytes]
        return np.frombuffer(buf, dtype=dtype).reshape(self.height, self.width)
