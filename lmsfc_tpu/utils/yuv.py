"""Raw YUV planar file IO (numpy), replacing the reference's `yuvio` dependency.

Ref surface: compressai_vision/utils/dataio.py:75-278 (readwriteYUV over
yuvio) and codecs/encdec_utils/rawvideo.py:38-320 (format metadata).

Supported pixel formats: yuv400 (luma only) and yuv420 / yuv444, each in 8-bit
(`uint8`) or 10-bit little-endian (`<u2`, values 0..1023) variants — the
formats the anchor codecs consume (YUV400_10le for feature frames,
YUV420_10le for remote-inference images).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_FORMATS = {
    "yuv400": (0, np.uint8),
    "yuv400_10le": (0, np.dtype("<u2")),
    "yuv420": (2, np.uint8),
    "yuv420_10le": (2, np.dtype("<u2")),
    "yuv444": (1, np.uint8),
    "yuv444_10le": (1, np.dtype("<u2")),
}


def frame_size_bytes(w: int, h: int, fmt: str) -> int:
    mode, dtype = _FORMATS[fmt]
    luma = w * h
    if mode == 0:
        total = luma
    elif mode == 1:
        total = luma * 3
    else:
        total = luma + 2 * ((w // 2) * (h // 2))
    return total * np.dtype(dtype).itemsize


@dataclass
class YUVWriter:
    path: Path
    width: int
    height: int
    fmt: str = "yuv400_10le"

    def __post_init__(self):
        self.path = Path(self.path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fd = open(self.path, "wb")

    def write_frame(
        self, y: np.ndarray, u: Optional[np.ndarray] = None, v: Optional[np.ndarray] = None
    ) -> None:
        mode, dtype = _FORMATS[self.fmt]
        assert y.shape == (self.height, self.width), (y.shape, self.height, self.width)
        self._fd.write(np.ascontiguousarray(y, dtype=dtype).tobytes())
        if mode != 0:
            assert u is not None and v is not None
            self._fd.write(np.ascontiguousarray(u, dtype=dtype).tobytes())
            self._fd.write(np.ascontiguousarray(v, dtype=dtype).tobytes())

    def close(self) -> None:
        self._fd.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class YUVReader:
    def __init__(self, path: Path, width: int, height: int, fmt: str = "yuv400_10le"):
        self.path = Path(path)
        self.width, self.height, self.fmt = width, height, fmt
        self._frame_bytes = frame_size_bytes(width, height, fmt)
        self.n_frames = self.path.stat().st_size // self._frame_bytes

    def read_frame(self, idx: int) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
        mode, dtype = _FORMATS[self.fmt]
        itemsize = np.dtype(dtype).itemsize
        with open(self.path, "rb") as fd:
            fd.seek(idx * self._frame_bytes)
            raw = fd.read(self._frame_bytes)
        buf = np.frombuffer(raw, dtype=dtype)
        w, h = self.width, self.height
        y = buf[: w * h].reshape(h, w)
        if mode == 0:
            return y, None, None
        if mode == 1:
            u = buf[w * h : 2 * w * h].reshape(h, w)
            v = buf[2 * w * h :].reshape(h, w)
        else:
            cw, ch = w // 2, h // 2
            u = buf[w * h : w * h + cw * ch].reshape(ch, cw)
            v = buf[w * h + cw * ch :].reshape(ch, cw)
        return y, u, v

    def frames(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]]:
        for i in range(self.n_frames):
            yield self.read_frame(i)
