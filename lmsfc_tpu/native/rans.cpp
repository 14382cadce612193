// rANS range coder with CompressAI-compatible bitstream semantics.
//
// Implements the 64-bit-state / 32-bit-word rANS variant of Giesen's
// "rans64" construction with the symbol/bypass layout used by CompressAI's
// `RansEncoder.encode_with_indexes` / `RansDecoder.decode_with_indexes`
// (reference dependency surveyed at SURVEY.md §2.9: compressai/cpp_exts/rans;
// the reference calls it through net.compress/net.decompress,
// compressai_vision/pipelines/fo_vcm/pipeline/compressai.py:140-142):
//
//   * probability precision: 16 bits; quantized CDFs sum to 1<<16
//   * per-symbol CDF row selected by an index array (channel / scale index)
//   * escape symbol = last regular symbol (max_value = cdf_length - 2);
//     out-of-range values are bypass-coded in 4-bit nibbles with a
//     unary-ish nibble-count prefix
//   * encoder is LIFO: symbols are buffered forward then encoded in reverse,
//     so the decoder reads the stream strictly forward
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain).
//
// Written from the public algorithm description; not a source copy.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;
// coarse decode-LUT bucket bits: 2^10 buckets/row x int16 = 2 KB/row
constexpr uint32_t kCoarseBits = 10;
constexpr uint32_t kBypassPrecision = 4;
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;
constexpr uint64_t kRansL = 1ull << 31;

using Rans64State = uint64_t;

inline void Rans64EncInit(Rans64State* r) { *r = kRansL; }

inline void Rans64EncPut(Rans64State* r, uint32_t** pptr, uint32_t start,
                         uint32_t freq, uint32_t scale_bits) {
  uint64_t x = *r;
  uint64_t x_max = ((kRansL >> scale_bits) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  *r = ((x / freq) << scale_bits) + (x % freq) + start;
}

inline void Rans64EncPutBits(Rans64State* r, uint32_t** pptr, uint32_t val,
                             uint32_t nbits) {
  uint64_t x = *r;
  uint32_t freq = 1u << (kPrecision - nbits);
  uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  *r = (x << nbits) | val;
}

inline void Rans64EncFlush(Rans64State* r, uint32_t** pptr) {
  uint64_t x = *r;
  *pptr -= 2;
  (*pptr)[0] = static_cast<uint32_t>(x >> 0);
  (*pptr)[1] = static_cast<uint32_t>(x >> 32);
}

inline void Rans64DecInit(Rans64State* r, uint32_t** pptr) {
  uint64_t x = static_cast<uint64_t>((*pptr)[0]) << 0;
  x |= static_cast<uint64_t>((*pptr)[1]) << 32;
  *pptr += 2;
  *r = x;
}

inline uint32_t Rans64DecGet(Rans64State* r, uint32_t scale_bits) {
  return static_cast<uint32_t>(*r & ((1ull << scale_bits) - 1));
}

inline void Rans64DecAdvance(Rans64State* r, uint32_t** pptr, uint32_t start,
                             uint32_t freq, uint32_t scale_bits) {
  uint64_t mask = (1ull << scale_bits) - 1;
  uint64_t x = *r;
  x = freq * (x >> scale_bits) + (x & mask) - start;
  if (x < kRansL) {
    x = (x << 32) | **pptr;
    *pptr += 1;
  }
  *r = x;
}

inline uint32_t Rans64DecGetBits(Rans64State* r, uint32_t** pptr,
                                 uint32_t nbits) {
  uint64_t x = *r;
  uint32_t val = static_cast<uint32_t>(x & ((1ull << nbits) - 1));
  x = x >> nbits;
  if (x < kRansL) {
    x = (x << 32) | **pptr;
    *pptr += 1;
  }
  *r = x;
  return val;
}

struct BufferedSymbol {
  uint32_t start;
  uint32_t range;  // freq for regular symbols; value payload for bypass
  bool bypass;
};

// Shared forward pass: map (symbols, indexes) onto the flat op sequence
// (regular symbol + optional escape prefix/nibble bypass ops). Returns
// false on a bad index / malformed cdf row.
bool buffer_symbols(const int32_t* symbols, const int32_t* indexes, int64_t n,
                    const int32_t* cdfs, int32_t cdf_stride,
                    const int32_t* cdf_lengths, const int32_t* offsets,
                    int32_t n_cdfs, std::vector<BufferedSymbol>* syms) {
  syms->reserve(static_cast<size_t>(n) + 16);

  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    if (idx < 0 || idx >= n_cdfs) return false;
    const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
    const int32_t max_value = cdf_lengths[idx] - 2;
    if (max_value < 0) return false;

    int32_t value = symbols[i] - offsets[idx];
    uint32_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint32_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (value - max_value));
      value = max_value;
    }
    syms->push_back({static_cast<uint32_t>(cdf[value]),
                     static_cast<uint32_t>(cdf[value + 1] - cdf[value]), false});

    if (value == max_value) {
      // nibble count
      uint32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
      // encode nibble count with a saturated prefix
      uint32_t val = n_bypass;
      while (val >= kMaxBypassVal) {
        syms->push_back({kMaxBypassVal, kBypassPrecision, true});
        val -= kMaxBypassVal;
      }
      syms->push_back({val, kBypassPrecision, true});
      // encode the raw nibbles, LSB first
      for (uint32_t j = 0; j < n_bypass; ++j) {
        syms->push_back(
            {(raw_val >> (j * kBypassPrecision)) & kMaxBypassVal,
             kBypassPrecision, true});
      }
    }
  }
  return true;
}

// Reverse rANS pass over the buffered ops with S independent interleaved
// states (op j uses state j%S; all states share one word stream). S>1
// splits the serial state-update dependency chain so the core's OoO window
// overlaps S updates — the classic interleaved-rANS ILP construction
// (Giesen). S=1 reproduces the original single-stream layout bit-exactly.
template <int S>
int64_t encode_ops(const std::vector<BufferedSymbol>& syms, uint8_t* out,
                   int64_t out_cap) {
  // worst case: one 32-bit word per buffered op + 8-byte flush per stream
  const int64_t worst = static_cast<int64_t>(syms.size()) * 4 + 8 * S;
  if (out_cap < worst) return -1;

  std::vector<uint32_t> buf(static_cast<size_t>(worst / 4) + 2 * S);
  uint32_t* ptr = buf.data() + buf.size();

  Rans64State st[S];
  for (int s = 0; s < S; ++s) Rans64EncInit(&st[s]);
  const int64_t m = static_cast<int64_t>(syms.size());
  for (int64_t j = m - 1; j >= 0; --j) {
    const BufferedSymbol& b = syms[static_cast<size_t>(j)];
    Rans64State* r = &st[j % S];
    if (b.bypass) {
      Rans64EncPutBits(r, &ptr, b.start, b.range);
    } else {
      Rans64EncPut(r, &ptr, b.start, b.range, kPrecision);
    }
  }
  // stream written back-to-front: flush S-1..0 so the decoder (reading
  // forward) initializes 0..S-1
  for (int s = S - 1; s >= 0; --s) Rans64EncFlush(&st[s], &ptr);

  const int64_t nbytes =
      static_cast<int64_t>(buf.data() + buf.size() - ptr) * 4;
  if (nbytes > out_cap) return -1;
  std::memcpy(out, ptr, static_cast<size_t>(nbytes));
  return nbytes;
}

}  // namespace

extern "C" {

// Returns bytes written to `out`, or -1 if `out_cap` is too small / bad input.
int64_t rans_encode_with_indexes(const int32_t* symbols, const int32_t* indexes,
                                 int64_t n, const int32_t* cdfs,
                                 int32_t cdf_stride, const int32_t* cdf_lengths,
                                 const int32_t* offsets, int32_t n_cdfs,
                                 uint8_t* out, int64_t out_cap) {
  std::vector<BufferedSymbol> syms;
  if (!buffer_symbols(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths,
                      offsets, n_cdfs, &syms))
    return -1;
  return encode_ops<1>(syms, out, out_cap);
}

// Interleaved variant: n_streams rANS states share one word stream
// (op j -> state j%n_streams). NOT CompressAI-layout-compatible — used by
// the learned codecs' own containers (which version the payload format).
// n_streams must be 2 or 4.
int64_t rans_encode_interleaved(const int32_t* symbols, const int32_t* indexes,
                                int64_t n, const int32_t* cdfs,
                                int32_t cdf_stride, const int32_t* cdf_lengths,
                                const int32_t* offsets, int32_t n_cdfs,
                                int32_t n_streams, uint8_t* out,
                                int64_t out_cap) {
  std::vector<BufferedSymbol> syms;
  if (!buffer_symbols(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths,
                      offsets, n_cdfs, &syms))
    return -1;
  switch (n_streams) {
    case 2: return encode_ops<2>(syms, out, out_cap);
    case 4: return encode_ops<4>(syms, out, out_cap);
    default: return -1;
  }
}

// Build the coarse cum->symbol lookup table (n_cdfs x 2^kCoarseBits int16)
// into a caller buffer. Each bucket stores the symbol containing the
// bucket's LOWEST cum value; decode scans forward at most a few entries.
// A full 2^16-per-row table (8 MB at 64 scale rows) is DRAM-latency bound —
// random cum values miss L2 on nearly every symbol and cap decode at
// ~6 Msym/s on a 1-core host. The coarse table is 64x smaller (L2-resident)
// and the forward scan touches the already-hot cdf row, restoring decode to
// encode-side throughput. Returns 0 on success, -1 on error.
int64_t rans_lut_build_coarse(const int32_t* cdfs, int32_t cdf_stride,
                              const int32_t* cdf_lengths, int32_t n_cdfs,
                              int16_t* lut) {
  for (int32_t c = 0; c < n_cdfs; ++c) {
    const int32_t* cdf = cdfs + static_cast<int64_t>(c) * cdf_stride;
    const int32_t n_sym = cdf_lengths[c] - 1;  // symbols 0..n_sym-1
    // LUT entries hold int16 symbol ids; an oversized table must fail
    // loudly rather than wrap and decode garbage
    if (n_sym - 1 > INT16_MAX) return -1;
    if (n_sym < 1) return -1;
    int16_t* row = lut + (static_cast<size_t>(c) << kCoarseBits);
    int32_t s = 0;
    for (uint32_t b = 0; b < (1u << kCoarseBits); ++b) {
      const uint32_t cum0 = b << (kPrecision - kCoarseBits);
      while (s < n_sym - 1 && static_cast<uint32_t>(cdf[s + 1]) <= cum0) ++s;
      row[b] = static_cast<int16_t>(s);
    }
  }
  return 0;
}

}  // extern "C"

namespace {

// Forward decode over the interleaved op sequence (op k -> state k%S).
// S=1 is the original single-stream decode.
template <int S>
int64_t decode_ops(const uint8_t* data, int64_t nbytes, const int32_t* indexes,
                   int64_t n, const int32_t* cdfs, int32_t cdf_stride,
                   const int32_t* cdf_lengths, const int32_t* offsets,
                   int32_t n_cdfs, int32_t* out_symbols,
                   const int16_t* prebuilt_lut) {
  if (nbytes < 8 * S || (nbytes % 4) != 0) return -1;
  std::vector<uint32_t> buf(static_cast<size_t>(nbytes / 4) + 4, 0u);
  std::memcpy(buf.data(), data, static_cast<size_t>(nbytes));
  uint32_t* ptr = buf.data();

  std::vector<int16_t> lut_local;
  const int16_t* lut = prebuilt_lut;
  bool use_lut = lut != nullptr;
  // the coarse table is cheap to build (2^10 writes/row), so it pays off
  // for any non-trivial payload even without a caller-side cache
  if (!use_lut && n >= static_cast<int64_t>(n_cdfs) * 64) {
    lut_local.resize(static_cast<size_t>(n_cdfs) << kCoarseBits);
    if (rans_lut_build_coarse(cdfs, cdf_stride, cdf_lengths, n_cdfs,
                              lut_local.data()) != 0)
      return -1;
    lut = lut_local.data();
    use_lut = true;
  }

  Rans64State st[S];
  for (int s = 0; s < S; ++s) Rans64DecInit(&st[s], &ptr);
  uint64_t k = 0;  // flat op counter, mirrors the encoder's buffered order

  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    if (idx < 0 || idx >= n_cdfs) return -1;
    const int32_t* cdf = cdfs + static_cast<int64_t>(idx) * cdf_stride;
    const int32_t max_value = cdf_lengths[idx] - 2;
    if (max_value < 0) return -1;

    Rans64State* r = &st[k++ % S];
    const uint32_t cum = Rans64DecGet(r, kPrecision);

    int32_t value;
    if (use_lut) {
      // coarse bucket gives a lower bound; scan forward on the (hot) cdf
      // row. cdf[n_sym] == 1<<kPrecision > cum normally ends the scan; the
      // explicit max_value bound keeps a malformed row from overrunning.
      value = lut[(static_cast<size_t>(idx) << kCoarseBits) |
                  (cum >> (kPrecision - kCoarseBits))];
      while (value < max_value && static_cast<uint32_t>(cdf[value + 1]) <= cum)
        ++value;
    } else {
      // find s with cdf[s] <= cum < cdf[s+1]
      int32_t lo = 0, hi = max_value;  // symbols 0..max_value inclusive
      while (lo < hi) {
        const int32_t mid = (lo + hi + 1) >> 1;
        if (static_cast<uint32_t>(cdf[mid]) <= cum) lo = mid;
        else hi = mid - 1;
      }
      value = lo;
    }

    Rans64DecAdvance(r, &ptr, static_cast<uint32_t>(cdf[value]),
                     static_cast<uint32_t>(cdf[value + 1] - cdf[value]),
                     kPrecision);

    if (value == max_value) {
      uint32_t val = Rans64DecGetBits(&st[k++ % S], &ptr, kBypassPrecision);
      uint32_t n_bypass = val;
      while (val == kMaxBypassVal) {
        val = Rans64DecGetBits(&st[k++ % S], &ptr, kBypassPrecision);
        n_bypass += val;
      }
      uint32_t raw_val = 0;
      for (uint32_t j = 0; j < n_bypass; ++j) {
        val = Rans64DecGetBits(&st[k++ % S], &ptr, kBypassPrecision);
        raw_val |= val << (j * kBypassPrecision);
      }
      value = static_cast<int32_t>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out_symbols[i] = value + offsets[idx];
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success, -1 on error. Writes n decoded values to out_symbols.
// prebuilt_lut: optional rans_lut_build_coarse output; pass NULL to fall
// back to a per-call coarse LUT (large n) or per-symbol binary search
// (small n).
int64_t rans_decode_with_indexes(const uint8_t* data, int64_t nbytes,
                                 const int32_t* indexes, int64_t n,
                                 const int32_t* cdfs, int32_t cdf_stride,
                                 const int32_t* cdf_lengths,
                                 const int32_t* offsets, int32_t n_cdfs,
                                 int32_t* out_symbols,
                                 const int16_t* prebuilt_lut) {
  return decode_ops<1>(data, nbytes, indexes, n, cdfs, cdf_stride, cdf_lengths,
                       offsets, n_cdfs, out_symbols, prebuilt_lut);
}

// Inverse of rans_encode_interleaved. n_streams must match the encoder's.
int64_t rans_decode_interleaved(const uint8_t* data, int64_t nbytes,
                                const int32_t* indexes, int64_t n,
                                const int32_t* cdfs, int32_t cdf_stride,
                                const int32_t* cdf_lengths,
                                const int32_t* offsets, int32_t n_cdfs,
                                int32_t n_streams, int32_t* out_symbols,
                                const int16_t* prebuilt_lut) {
  switch (n_streams) {
    case 2:
      return decode_ops<2>(data, nbytes, indexes, n, cdfs, cdf_stride,
                           cdf_lengths, offsets, n_cdfs, out_symbols,
                           prebuilt_lut);
    case 4:
      return decode_ops<4>(data, nbytes, indexes, n, cdfs, cdf_stride,
                           cdf_lengths, offsets, n_cdfs, out_symbols,
                           prebuilt_lut);
    default:
      return -1;
  }
}

}  // extern "C"
