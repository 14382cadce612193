"""Quantized-CDF table construction for the rANS coder.

`pmf_to_quantized_cdf` reproduces the algorithm of CompressAI's C++ helper
(compressai/cpp_exts — the one native dependency of the reference's learned
codec path, SURVEY.md §2.9): scale the pmf (with appended tail mass) to a
16-bit integer CDF, renormalize to exactly 2^precision, then repair zero-width
symbols by stealing probability mass from the lowest-frequency symbol. The
resulting tables drive `encode_with_indexes`/`decode_with_indexes` in
`lmsfc_tpu.native.rans`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np


def pmf_to_quantized_cdf(pmf: Sequence[float], precision: int = 16) -> np.ndarray:
    """Quantize a pmf (tail mass already appended) to an integer CDF.

    Returns an int32 array of length len(pmf)+1 with cdf[0]=0 and
    cdf[-1]=2**precision, strictly increasing.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("pmf entries must be finite and non-negative")
    n = len(pmf)
    cdf = np.zeros(n + 1, dtype=np.uint64)
    # round half away from zero (std::round), entries are >= 0
    cdf[1:] = np.floor(pmf * (1 << precision) + 0.5).astype(np.uint64)
    total = int(cdf.sum())
    if total == 0:
        raise ValueError("pmf is all zeros")
    # renormalize to 2^precision then prefix-sum
    cdf = ((1 << precision) * cdf) // total
    cdf = np.cumsum(cdf, dtype=np.uint64)
    cdf[-1] = 1 << precision

    cdf = cdf.astype(np.int64)
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            # steal one unit from the lowest-frequency symbol with freq > 1
            best_freq = np.iinfo(np.int64).max
            best_steal = -1
            for j in range(n):
                freq = cdf[j + 1] - cdf[j]
                if 1 < freq < best_freq:
                    best_freq = freq
                    best_steal = j
            if best_steal == -1:
                raise ValueError("cannot repair degenerate cdf")
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best_steal + 1] += 1
    assert cdf[0] == 0 and cdf[-1] == (1 << precision)
    assert np.all(np.diff(cdf) > 0), "cdf must be strictly increasing"
    return cdf.astype(np.int32)


@dataclass
class CdfTable:
    """Per-index quantized CDFs, as consumed by the rANS coder.

    cdfs:        [n_indexes, max_len] int32, row i valid up to cdf_lengths[i]
    cdf_lengths: [n_indexes] int32 (= pmf_length + 2)
    offsets:     [n_indexes] int32 (symbol s encodes value s + offset)
    """

    cdfs: np.ndarray
    cdf_lengths: np.ndarray
    offsets: np.ndarray

    @classmethod
    def from_pmfs(
        cls,
        pmfs: np.ndarray,
        pmf_lengths: np.ndarray,
        tail_masses: np.ndarray,
        offsets: np.ndarray,
        precision: int = 16,
    ) -> "CdfTable":
        """Build from per-index pmf rows (padded to a common max length)."""
        n = pmfs.shape[0]
        max_len = int(np.max(pmf_lengths)) + 2
        cdfs = np.zeros((n, max_len), dtype=np.int32)
        lengths = np.zeros(n, dtype=np.int32)
        for i in range(n):
            L = int(pmf_lengths[i])
            prob = np.concatenate([pmfs[i, :L], [float(tail_masses[i])]])
            row = pmf_to_quantized_cdf(prob, precision)
            cdfs[i, : len(row)] = row
            lengths[i] = len(row)
        return cls(cdfs=cdfs, cdf_lengths=lengths, offsets=np.asarray(offsets, np.int32))
