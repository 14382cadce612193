"""ctypes bindings for the native rANS coder (rans.cpp).

The shared library is built on demand with g++ (no pybind11 in this
toolchain; ctypes keeps the Python<->C++ boundary dependency-free). The
`RansEncoder`/`RansDecoder` classes expose the CompressAI-compatible
`encode_with_indexes` / `decode_with_indexes` API consumed by the entropy
models (SURVEY.md §2.9).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "rans.cpp"
_LIB = _HERE / "librans.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

# Interleaving costs (S-1) extra 8-byte flushes (+ a few normalization
# words) per stream — negligible on real frame payloads, dominant on tiny
# ones. Both sides know the symbol count n before decoding, so the stream
# count is chosen deterministically from it: payloads below this many
# symbols always code single-stream (no tag byte needed on the wire).
INTERLEAVE_MIN_SYMS = 4096


def ensure_built(force: bool = False) -> Path:
    """Compile librans.so if missing or stale; returns its path."""
    with _lock:
        if force or not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(_LIB),
            ]
            subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        ensure_built()
        lib = ctypes.CDLL(str(_LIB))
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rans_encode_with_indexes.restype = ctypes.c_int64
        lib.rans_encode_with_indexes.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int32, i32p, i32p,
            ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.rans_decode_with_indexes.restype = ctypes.c_int64
        lib.rans_decode_with_indexes.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int32,
            i32p, i32p, ctypes.c_int32, i32p, i16p,
        ]
        lib.rans_lut_build_coarse.restype = ctypes.c_int64
        lib.rans_lut_build_coarse.argtypes = [i32p, ctypes.c_int32, i32p,
                                              ctypes.c_int32, i16p]
        lib.rans_encode_interleaved.restype = ctypes.c_int64
        lib.rans_encode_interleaved.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int32, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, u8p, ctypes.c_int64,
        ]
        lib.rans_decode_interleaved.restype = ctypes.c_int64
        lib.rans_decode_interleaved.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int32,
            i32p, i32p, ctypes.c_int32, ctypes.c_int32, i32p, i16p,
        ]
        _lib = lib
    return _lib


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class RansEncoder:
    """streams=1 is the CompressAI-compatible layout; streams in {2,4}
    selects the interleaved-state variant (~1.6x throughput on this host,
    own layout — the learned codecs' containers version it in-band)."""

    def __init__(self, streams: int = 1):
        self.streams = streams

    def encode_with_indexes(
        self,
        symbols: Sequence[int],
        indexes: Sequence[int],
        cdfs: np.ndarray,
        cdf_lengths: Sequence[int],
        offsets: Sequence[int],
        streams: Optional[int] = None,
    ) -> bytes:
        streams = self.streams if streams is None else streams
        lib = _load()
        symbols = _i32(symbols).ravel()
        indexes = _i32(indexes).ravel()
        cdfs = _i32(cdfs)
        cdf_lengths = _i32(cdf_lengths)
        offsets = _i32(offsets)
        assert symbols.shape == indexes.shape
        n = symbols.size
        if streams in (2, 4) and n < INTERLEAVE_MIN_SYMS:
            streams = 1  # deterministic from n; decoder applies the same rule
        # worst case ~ (1 symbol + ~11 bypass nibbles) words per symbol + flush
        cap = 4 * (13 * n) + 64
        out = np.empty(cap, dtype=np.uint8)
        if streams == 1:
            nbytes = lib.rans_encode_with_indexes(
                _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
                ctypes.c_int64(n), _ptr(cdfs, ctypes.c_int32),
                ctypes.c_int32(cdfs.shape[1]), _ptr(cdf_lengths, ctypes.c_int32),
                _ptr(offsets, ctypes.c_int32), ctypes.c_int32(cdfs.shape[0]),
                _ptr(out, ctypes.c_uint8), ctypes.c_int64(cap),
            )
        else:
            nbytes = lib.rans_encode_interleaved(
                _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
                ctypes.c_int64(n), _ptr(cdfs, ctypes.c_int32),
                ctypes.c_int32(cdfs.shape[1]), _ptr(cdf_lengths, ctypes.c_int32),
                _ptr(offsets, ctypes.c_int32), ctypes.c_int32(cdfs.shape[0]),
                ctypes.c_int32(streams),
                _ptr(out, ctypes.c_uint8), ctypes.c_int64(cap),
            )
        if nbytes < 0:
            raise RuntimeError(
                f"rans encode failed (streams={streams}; must be 1, 2 or 4)")
        return out[:nbytes].tobytes()

    # alias matching CompressAI's streamed API shape
    encode = encode_with_indexes


class RansDecoder:
    """Decoder with a per-table coarse-LUT cache: a 2^10-bucket cum->symbol
    lower-bound row per CDF (2 KB/row, L2-resident — a full 2^16 row is 128
    KB/row and DRAM-latency bound), built once per CDF table and reused
    across frames. `streams` must match the encoder's (the learned codecs
    record it via their container version)."""

    def __init__(self, streams: int = 1):
        self.streams = streams
        self._lut_cache = {}

    def _lut_for(self, cdfs: np.ndarray, cdf_lengths: np.ndarray):
        key = (cdfs.ctypes.data, cdfs.shape)
        lut = self._lut_cache.get(key)
        if lut is None:
            lib = _load()
            lut = np.empty(cdfs.shape[0] << 10, np.int16)
            rc = lib.rans_lut_build_coarse(
                _ptr(cdfs, ctypes.c_int32), ctypes.c_int32(cdfs.shape[1]),
                _ptr(cdf_lengths, ctypes.c_int32),
                ctypes.c_int32(cdfs.shape[0]),
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            )
            if rc != 0:
                raise RuntimeError("rans_lut_build_coarse failed (oversized table?)")
            # key on the ORIGINAL buffer address: hold a reference so the
            # address can't be recycled while the cache entry lives
            self._lut_cache[key] = lut = (lut, cdfs)
        return lut[0]

    def decode_with_indexes(
        self,
        data: bytes,
        indexes: Sequence[int],
        cdfs: np.ndarray,
        cdf_lengths: Sequence[int],
        offsets: Sequence[int],
        streams: Optional[int] = None,
    ) -> np.ndarray:
        streams = self.streams if streams is None else streams
        lib = _load()
        indexes = _i32(indexes).ravel()
        cdfs = _i32(cdfs)
        cdf_lengths = _i32(cdf_lengths)
        offsets = _i32(offsets)
        n = indexes.size
        if streams in (2, 4) and n < INTERLEAVE_MIN_SYMS:
            streams = 1  # mirrors the encoder's n-based rule
        buf = np.frombuffer(data, dtype=np.uint8)
        buf = np.ascontiguousarray(buf)
        out = np.empty(n, dtype=np.int32)
        # the coarse LUT costs ~2^10 writes/row to build, so it pays off for
        # all but the tiniest payloads on a fresh table
        use_cache = n >= cdfs.shape[0] * 16 or (
            (cdfs.ctypes.data, cdfs.shape) in self._lut_cache
        )
        lut = self._lut_for(cdfs, cdf_lengths) if use_cache else None
        lut_arg = (
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
            if lut is not None
            else ctypes.POINTER(ctypes.c_int16)()
        )
        if streams == 1:
            rc = lib.rans_decode_with_indexes(
                _ptr(buf, ctypes.c_uint8), ctypes.c_int64(buf.size),
                _ptr(indexes, ctypes.c_int32), ctypes.c_int64(n),
                _ptr(cdfs, ctypes.c_int32), ctypes.c_int32(cdfs.shape[1]),
                _ptr(cdf_lengths, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
                ctypes.c_int32(cdfs.shape[0]), _ptr(out, ctypes.c_int32),
                lut_arg,
            )
        else:
            rc = lib.rans_decode_interleaved(
                _ptr(buf, ctypes.c_uint8), ctypes.c_int64(buf.size),
                _ptr(indexes, ctypes.c_int32), ctypes.c_int64(n),
                _ptr(cdfs, ctypes.c_int32), ctypes.c_int32(cdfs.shape[1]),
                _ptr(cdf_lengths, ctypes.c_int32), _ptr(offsets, ctypes.c_int32),
                ctypes.c_int32(cdfs.shape[0]), ctypes.c_int32(streams),
                _ptr(out, ctypes.c_int32), lut_arg,
            )
        if rc != 0:
            raise RuntimeError(
                f"rans decode failed (streams={streams}; must match encoder)")
        return out

    decode = decode_with_indexes
