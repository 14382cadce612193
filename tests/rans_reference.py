"""Pure-Python reference of the CompressAI rans64 bitstream construction.

An INDEPENDENT transcription of the public rans64 algorithm (Giesen's
ryg_rans 64-bit/32-bit-word variant) with CompressAI's symbol/bypass layout
(16-bit precision, escape = last regular symbol, 4-bit nibble bypass with
saturated prefix, LIFO encode / forward decode, little-endian u32 words,
final flush of the 64-bit state as two words).

Used by tests/test_rans_golden.py to derive expected byte streams that the
C++ coder (lmsfc_tpu/native/rans.cpp) must reproduce byte-identically, and
to regenerate the committed fixtures under tests/fixtures/rans/.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

PRECISION = 16
BYPASS_PRECISION = 4
MAX_BYPASS = (1 << BYPASS_PRECISION) - 1
RANS_L = 1 << 31
MASK32 = (1 << 32) - 1


def encode_with_indexes(
    symbols: Sequence[int],
    indexes: Sequence[int],
    cdfs: Sequence[Sequence[int]],
    cdf_lengths: Sequence[int],
    offsets: Sequence[int],
) -> bytes:
    # buffer (start, range, is_bypass) ops forward
    ops: List[tuple] = []
    for value, idx in zip(symbols, indexes):
        cdf = cdfs[idx]
        max_value = cdf_lengths[idx] - 2
        v = value - offsets[idx]
        raw_val = 0
        if v < 0:
            raw_val = -2 * v - 1
            v = max_value
        elif v >= max_value:
            raw_val = 2 * (v - max_value)
            v = max_value
        ops.append((cdf[v], cdf[v + 1] - cdf[v], False))
        if v == max_value:
            n_bypass = 0
            while (raw_val >> (n_bypass * BYPASS_PRECISION)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= MAX_BYPASS:
                ops.append((MAX_BYPASS, BYPASS_PRECISION, True))
                val -= MAX_BYPASS
            ops.append((val, BYPASS_PRECISION, True))
            for j in range(n_bypass):
                ops.append(
                    ((raw_val >> (j * BYPASS_PRECISION)) & MAX_BYPASS,
                     BYPASS_PRECISION, True)
                )

    # encode in reverse; words are emitted back-to-front
    words: List[int] = []
    x = RANS_L
    for start, rng, bypass in reversed(ops):
        if bypass:
            val, nbits = start, rng
            freq = 1 << (PRECISION - nbits)
            x_max = ((RANS_L >> PRECISION) << 32) * freq
            if x >= x_max:
                words.append(x & MASK32)
                x >>= 32
            x = (x << nbits) | val
        else:
            freq = rng
            x_max = ((RANS_L >> PRECISION) << 32) * freq
            if x >= x_max:
                words.append(x & MASK32)
                x >>= 32
            x = ((x // freq) << PRECISION) + (x % freq) + start
    # flush: low word then high word at the stream head
    head = [x & MASK32, (x >> 32) & MASK32]
    stream = head + list(reversed(words))
    return b"".join(struct.pack("<I", w) for w in stream)


def decode_with_indexes(
    data: bytes,
    indexes: Sequence[int],
    cdfs: Sequence[Sequence[int]],
    cdf_lengths: Sequence[int],
    offsets: Sequence[int],
) -> List[int]:
    words = list(struct.unpack(f"<{len(data)//4}I", data))
    pos = 2
    x = words[0] | (words[1] << 32)
    out = []
    for idx in indexes:
        cdf = cdfs[idx]
        max_value = cdf_lengths[idx] - 2
        cum = x & ((1 << PRECISION) - 1)
        # linear search (reference clarity over speed)
        v = 0
        while not (cdf[v] <= cum < cdf[v + 1]):
            v += 1
        start, freq = cdf[v], cdf[v + 1] - cdf[v]
        x = freq * (x >> PRECISION) + (x & ((1 << PRECISION) - 1)) - start
        if x < RANS_L:
            x = (x << 32) | words[pos]
            pos += 1
        if v == max_value:
            def get_bits(x):
                val = x & MAX_BYPASS
                x >>= BYPASS_PRECISION
                nonlocal pos
                if x < RANS_L:
                    x = (x << 32) | words[pos]
                    pos += 1
                return x, val

            x, val = get_bits(x)
            n_bypass = val
            while val == MAX_BYPASS:
                x, val = get_bits(x)
                n_bypass += val
            raw_val = 0
            for j in range(n_bypass):
                x, val = get_bits(x)
                raw_val |= val << (j * BYPASS_PRECISION)
            v = raw_val >> 1
            if raw_val & 1:
                v = -v - 1
            else:
                v += max_value
        out.append(v + offsets[idx])
    return out
