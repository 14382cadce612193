"""Big-endian struct readers/writers for self-decodable bitstream headers.

Same wire format as the reference's header helpers
(compressai_vision/codecs/encdec_utils/readwrite.py:50-91): unsigned 32-bit
ints, unsigned chars, IEEE float32, raw byte blobs — all big-endian — so
bitstreams remain parseable across implementations.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Sequence, Tuple


def write_uints(fd: BinaryIO, values: Sequence[int], fmt: str = ">{:d}I") -> int:
    fd.write(struct.pack(fmt.format(len(values)), *values))
    return len(values) * 4


def write_uchars(fd: BinaryIO, values: Sequence[int], fmt: str = ">{:d}B") -> int:
    fd.write(struct.pack(fmt.format(len(values)), *values))
    return len(values)


def write_float32(fd: BinaryIO, values: Sequence[float], fmt: str = ">{:d}f") -> int:
    fd.write(struct.pack(fmt.format(len(values)), *values))
    return len(values) * 4


def write_bytes(fd: BinaryIO, values: bytes, fmt: str = ">{:d}s") -> int:
    if len(values) == 0:
        return 0
    fd.write(struct.pack(fmt.format(len(values)), values))
    return len(values)


def read_uints(fd: BinaryIO, n: int, fmt: str = ">{:d}I") -> Tuple[int, ...]:
    return struct.unpack(fmt.format(n), fd.read(n * 4))


def read_uchars(fd: BinaryIO, n: int, fmt: str = ">{:d}B") -> Tuple[int, ...]:
    return struct.unpack(fmt.format(n), fd.read(n))


def read_float32(fd: BinaryIO, n: int, fmt: str = ">{:d}f") -> Tuple[float, ...]:
    return struct.unpack(fmt.format(n), fd.read(n * 4))


def read_bytes(fd: BinaryIO, n: int, fmt: str = ">{:d}s") -> bytes:
    return struct.unpack(fmt.format(n), fd.read(n))[0]
