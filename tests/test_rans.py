import numpy as np
import pytest

from lmsfc_tpu.entropy.cdf import CdfTable, pmf_to_quantized_cdf
from lmsfc_tpu.native import RansDecoder, RansEncoder, ensure_built


@pytest.fixture(scope="module", autouse=True)
def built():
    ensure_built()


def _gaussian_cdf_table(n_scales=4, support=21):
    rng = np.random.default_rng(0)
    pmfs, lengths, tails, offsets = [], [], [], []
    center = support // 2
    for i in range(n_scales):
        sigma = 0.5 + i
        xs = np.arange(support) - center
        pmf = np.exp(-0.5 * (xs / sigma) ** 2)
        pmf = pmf / pmf.sum() * (1 - 1e-4)
        pmfs.append(pmf)
        lengths.append(support)
        tails.append(1e-4)
        offsets.append(-center)
    pmfs = np.stack(pmfs)
    return CdfTable.from_pmfs(pmfs, np.array(lengths), np.array(tails), np.array(offsets))


class TestQuantizedCdf:
    def test_monotone_and_normalized(self):
        pmf = [0.1, 0.2, 0.3, 0.39, 0.01]
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) > 0)

    def test_zero_prob_symbols_get_repaired(self):
        pmf = [0.5, 0.0, 0.0, 0.5, 1e-12]
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert np.all(np.diff(cdf) > 0)
        assert cdf[-1] == 1 << 16

    def test_rejects_negative(self):
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf([0.5, -0.1], 16)


class TestRansRoundtrip:
    def test_in_range_symbols(self):
        table = _gaussian_cdf_table()
        rng = np.random.default_rng(1)
        n = 5000
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        # symbols within [-8, 8] — inside support for all scales
        symbols = rng.integers(-8, 9, n).astype(np.int32)
        enc, dec = RansEncoder(), RansDecoder()
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        out = dec.decode_with_indexes(bs, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)

    def test_out_of_range_bypass(self):
        table = _gaussian_cdf_table()
        rng = np.random.default_rng(2)
        n = 2000
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        symbols = rng.integers(-500, 500, n).astype(np.int32)
        symbols[:10] = [-100000, 100000, -1 << 20, 1 << 20, 0, 1, -1, 12345, -54321, 10]
        enc, dec = RansEncoder(), RansDecoder()
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        out = dec.decode_with_indexes(bs, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)

    def test_empty(self):
        table = _gaussian_cdf_table()
        enc, dec = RansEncoder(), RansDecoder()
        bs = enc.encode_with_indexes([], [], table.cdfs, table.cdf_lengths, table.offsets)
        assert len(bs) == 8  # flush only
        out = dec.decode_with_indexes(bs, [], table.cdfs, table.cdf_lengths, table.offsets)
        assert out.size == 0

    def test_compression_efficiency_near_entropy(self):
        """Coded size should be close to the pmf entropy (within ~2%+const)."""
        table = _gaussian_cdf_table(n_scales=1, support=41)
        rng = np.random.default_rng(3)
        n = 100_000
        sigma = 0.5
        symbols = np.clip(np.round(rng.normal(0, sigma, n)), -20, 20).astype(np.int32)
        indexes = np.zeros(n, dtype=np.int32)
        enc = RansEncoder()
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        # entropy of the quantized gaussian
        vals, counts = np.unique(symbols, return_counts=True)
        p = counts / n
        H = -(p * np.log2(p)).sum()
        actual_bits = len(bs) * 8
        assert actual_bits < n * H * 1.05 + 128, (actual_bits, n * H)

    def test_deterministic(self):
        table = _gaussian_cdf_table()
        symbols = np.arange(-5, 6, dtype=np.int32)
        indexes = np.zeros(11, dtype=np.int32)
        enc = RansEncoder()
        a = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        b = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert a == b


class TestInterleavedStreams:
    """4-way interleaved rANS (native/rans.cpp encode_ops/decode_ops<S>):
    same op sequence over S alternating states sharing one word stream —
    an ILP construction, so it must be a pure re-layout: identical symbols
    back, near-identical size, and strictly incompatible across S."""

    @pytest.mark.parametrize("streams", [2, 4])
    def test_roundtrip_with_bypass(self, streams):
        table = _gaussian_cdf_table()
        rng = np.random.default_rng(3)
        n = 5000
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        symbols = rng.integers(-8, 9, n).astype(np.int32)
        symbols[::17] = rng.integers(-5000, 5000, symbols[::17].size)
        enc = RansEncoder(streams=streams)
        dec = RansDecoder(streams=streams)
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        out = dec.decode_with_indexes(bs, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)

    def test_size_overhead_is_flush_only(self):
        table = _gaussian_cdf_table()
        rng = np.random.default_rng(4)
        n = 20000
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        symbols = rng.integers(-8, 9, n).astype(np.int32)
        enc = RansEncoder()
        base = len(enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets))
        four = len(enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets, streams=4))
        # 3 extra 8-byte flushes + at most a few normalization words
        assert base <= four <= base + 24 + 16

    @pytest.mark.parametrize("n", [0, 1, 2, 3, 5])
    def test_tiny_payloads(self, n):
        table = _gaussian_cdf_table()
        rng = np.random.default_rng(5)
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        symbols = rng.integers(-8, 9, n).astype(np.int32)
        enc, dec = RansEncoder(streams=4), RansDecoder(streams=4)
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        out = dec.decode_with_indexes(bs, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)

    def test_per_call_override_beats_instance_default(self):
        table = _gaussian_cdf_table()
        rng = np.random.default_rng(6)
        n = 1000
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        symbols = rng.integers(-8, 9, n).astype(np.int32)
        enc, dec = RansEncoder(streams=4), RansDecoder()
        bs = enc.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets, streams=1)
        out = dec.decode_with_indexes(bs, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)


    def test_small_payload_stays_single_stream(self):
        """Payloads under INTERLEAVE_MIN_SYMS code single-stream regardless
        of the configured stream count (the 24-byte interleave flush
        overhead would dominate tiny streams); the rule is a deterministic
        function of n, so encoder and decoder agree without a wire tag."""
        from lmsfc_tpu.native.rans import INTERLEAVE_MIN_SYMS

        table = _gaussian_cdf_table()
        rng = np.random.default_rng(7)
        n = 512
        assert n < INTERLEAVE_MIN_SYMS
        indexes = rng.integers(0, table.cdfs.shape[0], n).astype(np.int32)
        symbols = rng.integers(-8, 9, n).astype(np.int32)
        enc1, enc4 = RansEncoder(streams=1), RansEncoder(streams=4)
        bs1 = enc1.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        bs4 = enc4.encode_with_indexes(symbols, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert bs1 == bs4
        out = RansDecoder(streams=4).decode_with_indexes(
            bs4, indexes, table.cdfs, table.cdf_lengths, table.offsets)
        assert np.array_equal(out, symbols)

    def test_invalid_stream_count_raises(self):
        table = _gaussian_cdf_table()
        enc = RansEncoder()
        with pytest.raises(RuntimeError):
            enc.encode_with_indexes([0], [0], table.cdfs, table.cdf_lengths, table.offsets, streams=3)
