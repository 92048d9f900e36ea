// anscoder.cpp — host-side rANS64 entropy-coding backend for cbench_basic_tpu.
//
// Fresh implementation of the bitstream format used by the reference
// framework's C++ coder (behavioral contract documented from
// cbench/csrc/ans/rans64.{h,cpp,hpp} and ans_interface.{hpp,cpp}):
//   * 64-bit-state rANS with 32-bit word renormalization (ryg_rans layout:
//     lower bound L=2^31, flush writes two u32 words lo,hi; stream is
//     consumed forward by the decoder).
//   * 16-bit default frequency precision; quantized CDFs built from float
//     PMFs with round-then-rescale and "frequency stealing" so every symbol
//     keeps freq >= 1 (contract of pmf_to_quantized_cdf, rans64.cpp:68-121).
//   * Per-symbol distribution selection through an `indexes` array.
//   * Optional bypass coding: out-of-range values map to the final
//     "tail" slot of the CDF and the raw magnitude is emitted as
//     sign-folded 4-bit chunks preceded by a unary-ish chunk count
//     (rans64.cpp:276-335, 466-490).
//   * Optional in-loop autoregression: the distribution index of each
//     symbol is rewritten from previously coded neighbor symbols via 3D/4D
//     lookup tables or a clamped scaled-add linear op
//     (ans_interface.hpp:58-105, ar_funcs.hpp:57-92).
//
// Performance notes (this implementation, not the reference's):
//   * Encoder uses Alverson fixed-point reciprocals per (dist, value) so the
//     hot loop has no integer division; the emitted bitstream is bit-exact
//     with the plain divide form.
//   * Decoder uses a per-distribution cum2sym lookup table (2^prec u16
//     entries) giving O(1) symbol resolution instead of a linear CDF scan.
//   * Exported as a plain C API for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o _anscoder.so anscoder.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <memory>
#include <numeric>
#include <string>
#include <vector>

#include "ar_ops.hpp"

namespace tpuans {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i32 = int32_t;
using i64 = int64_t;

// Lower bound of the rANS normalization interval (63-bit state usage).
constexpr u64 kLow = 1ull << 31;

// ---------------------------------------------------------------------------
// Quantized-CDF construction (behavioral contract: rans64.cpp:68-126).
// pmf: float probabilities (need not be exactly normalized).
// Returns a CDF with pmf.size()+1 entries, cdf[0]=0, cdf.back()=2^precision,
// strictly increasing (every symbol gets freq >= 1 via frequency stealing).
// ---------------------------------------------------------------------------
std::vector<i32> quantize_pmf(const std::vector<float>& pmf, int precision) {
  const size_t n = pmf.size();
  std::vector<i32> cdf(n + 1);
  cdf[0] = 0;
  for (size_t i = 0; i < n; ++i) {
    cdf[i + 1] = static_cast<i32>(std::round(pmf[i] * static_cast<float>(1 << precision)));
  }

  // Plain int accumulation, matching the reference's std::accumulate(..., 0).
  i32 total_i = 0;
  for (size_t i = 0; i <= n; ++i) total_i += cdf[i];
  const u32 total = static_cast<u32>(total_i);

  for (size_t i = 0; i <= n; ++i) {
    cdf[i] = static_cast<i32>((static_cast<u64>(1u << precision) * static_cast<u32>(cdf[i])) / total);
  }
  for (size_t i = 1; i <= n; ++i) cdf[i] += cdf[i - 1];
  cdf[n] = 1 << precision;

  // Frequency stealing: any zero-width slot takes one count from the
  // smallest slot that still has freq > 1.
  for (size_t i = 0; i + 1 <= n; ++i) {
    if (cdf[i] == cdf[i + 1]) {
      u32 best_freq = ~0u;
      i64 best = -1;
      for (size_t j = 0; j + 1 <= n; ++j) {
        const u32 freq = static_cast<u32>(cdf[j + 1] - cdf[j]);
        if (freq > 1 && freq < best_freq) {
          best_freq = freq;
          best = static_cast<i64>(j);
        }
      }
      if (best < 0) return {};  // degenerate pmf; caller reports error
      if (best < static_cast<i64>(i)) {
        for (i64 j = best + 1; j <= static_cast<i64>(i); ++j) cdf[j]--;
      } else {
        for (i64 j = static_cast<i64>(i) + 1; j <= best; ++j) cdf[j]++;
      }
    }
  }
  return cdf;
}

// ---------------------------------------------------------------------------
// Encoder symbol with fixed-point reciprocal (Alverson division), so the
// per-symbol state update is mul-hi + shift instead of a divide. Produces
// exactly x = (x/freq)<<prec + (x%freq) + start.
// ---------------------------------------------------------------------------
struct EncSym {
  u64 rcp_freq;
  u32 freq;
  u32 bias;
  u32 cmpl_freq;
  u32 rcp_shift;
};

inline void enc_sym_init(EncSym* s, u32 start, u32 freq, u32 precision) {
  s->freq = freq;
  s->cmpl_freq = (1u << precision) - freq;
  if (freq < 2) {
    s->rcp_freq = ~0ull;
    s->rcp_shift = 0;
    s->bias = start + (1u << precision) - 1;
  } else {
    u32 shift = 0;
    while (freq > (1u << shift)) shift++;
    const u64 x1 = 1ull << (shift + 31);
    const u64 t1 = x1 / freq;
    u64 x0 = (freq - 1) + ((x1 % freq) << 32);
    const u64 t0 = x0 / freq;
    s->rcp_freq = t0 + (t1 << 32);
    s->rcp_shift = shift - 1;
    s->bias = start;
  }
}

inline u64 mul_hi(u64 a, u64 b) {
  return static_cast<u64>((static_cast<unsigned __int128>(a) * b) >> 64);
}

// Backward u32 writer: rANS emits words back-to-front.
struct BackWriter {
  std::vector<u32> buf;
  size_t pos;  // index of first valid word
  explicit BackWriter(size_t max_words) : buf(max_words), pos(max_words) {}
  inline void put(u32 w) { buf[--pos] = w; }
  size_t words() const { return buf.size() - pos; }
};

inline void enc_put(u64* state, BackWriter* w, const EncSym& sym, u32 precision) {
  u64 x = *state;
  const u64 x_max = ((kLow >> precision) << 32) * sym.freq;
  if (x >= x_max) {
    w->put(static_cast<u32>(x));
    x >>= 32;
  }
  *state = x + sym.bias + (mul_hi(x, sym.rcp_freq) >> sym.rcp_shift) * sym.cmpl_freq;
}

// Raw-bits put (bypass coding). Fixed 16-bit virtual precision, matching
// Rans64EncPutBits (rans64.cpp:29-47).
inline void enc_put_bits(u64* state, BackWriter* w, u32 val, u32 nbits) {
  u64 x = *state;
  const u32 freq = 1u << (16 - nbits);
  const u64 x_max = ((kLow >> 16) << 32) * freq;
  if (x >= x_max) {
    w->put(static_cast<u32>(x));
    x >>= 32;
  }
  *state = (x << nbits) | val;
}

inline void enc_flush(u64 state, BackWriter* w) {
  w->put(static_cast<u32>(state >> 32));
  w->put(static_cast<u32>(state));
}

// Forward u32 reader for decoding.
struct FwdReader {
  const u32* ptr;
  inline u32 next() { return *ptr++; }
};

inline void dec_init(u64* state, FwdReader* r) {
  u64 x = static_cast<u64>(r->next());
  x |= static_cast<u64>(r->next()) << 32;
  *state = x;
}

inline u32 dec_peek(u64 state, u32 precision) {
  return static_cast<u32>(state & ((1u << precision) - 1));
}

inline void dec_advance(u64* state, FwdReader* r, u32 start, u32 freq, u32 precision) {
  const u64 mask = (1ull << precision) - 1;
  u64 x = *state;
  x = freq * (x >> precision) + (x & mask) - start;
  if (x < kLow) x = (x << 32) | r->next();
  *state = x;
}

inline u32 dec_get_bits(u64* state, FwdReader* r, u32 nbits) {
  u64 x = *state;
  const u32 val = static_cast<u32>(x & ((1u << nbits) - 1));
  x >>= nbits;
  if (x < kLow) x = (x << 32) | r->next();
  *state = x;
  return val;
}

// ---------------------------------------------------------------------------
// Autoregression support.
// ---------------------------------------------------------------------------
// Cached symbol for deferred (grouped) encoding.
struct CacheSym {
  u16 start;
  u16 range;
  u8 bypass;
};

// ---------------------------------------------------------------------------
// Codec context.
// ---------------------------------------------------------------------------
struct Ctx {
  u32 freq_precision = 16;
  bool bypass_coding = true;
  u32 bypass_precision = 4;
  u32 max_bypass_val = 15;

  bool inited = false;

  // Per-distribution tables.
  std::vector<std::vector<i32>> cdfs;
  std::vector<i32> cdf_sizes;
  std::vector<i32> offsets;
  std::vector<std::vector<EncSym>> enc_syms;   // [dist][value]
  std::vector<std::vector<u16>> cum2sym;       // [dist][cum] -> value
  bool use_cum2sym = true;                     // false -> cdf binary search

  // In-loop autoregression (shared impl: ar_ops.hpp).
  ArState ar;

  // Encoder symbol cache (cache=true mode, flushed into one stream).
  std::vector<CacheSym> cache;

  // Decoder stream state.
  std::string stream;
  u64 dec_state = 0;
  FwdReader dec_reader{nullptr};

  // Last encode output (exposed via C API copy-out).
  std::string out;

  std::string error;
};

inline void build_fast_tables(Ctx* c) {
  const size_t nd = c->cdfs.size();
  c->enc_syms.assign(nd, {});
  c->cum2sym.assign(nd, {});
  // Dense cum->symbol tables are O(1) per decode step but cost
  // 2^precision u16 per distribution; past the L2 budget they thrash the
  // cache and lose to an 8-step binary search over the (cache-hot) cdf row
  // (measured 2x decode slowdown at 64 dists x 16-bit precision).
  const size_t c2s_bytes = nd * (size_t(1) << c->freq_precision) * sizeof(u16);
  c->use_cum2sym = c2s_bytes <= (size_t(1) << 21);  // 2 MB budget
  for (size_t d = 0; d < nd; ++d) {
    const auto& cdf = c->cdfs[d];
    const int sz = c->cdf_sizes[d];  // number of cdf entries (= nsym+1)
    auto& es = c->enc_syms[d];
    es.resize(sz - 1);
    for (int v = 0; v + 1 < sz; ++v) {
      enc_sym_init(&es[v], static_cast<u32>(cdf[v]),
                   static_cast<u32>(cdf[v + 1] - cdf[v]), c->freq_precision);
    }
    if (!c->use_cum2sym) continue;
    auto& c2s = c->cum2sym[d];
    c2s.resize(size_t(1) << c->freq_precision);
    for (int v = 0; v + 1 < sz; ++v) {
      for (i32 cum = cdf[v]; cum < cdf[v + 1]; ++cum) c2s[cum] = static_cast<u16>(v);
    }
  }
}

// Binary search: largest s with cdf[s] <= cum (cdf ascending, sz entries).
inline i32 cdf_find_symbol(const i32* cdf, int sz, u32 cum) {
  int lo = 0, hi = sz - 1;
  while (hi - lo > 1) {
    const int mid = (lo + hi) >> 1;
    if (static_cast<u32>(cdf[mid]) <= cum) lo = mid; else hi = mid;
  }
  return lo;
}

// AR index update delegates to the shared ArState (ar_ops.hpp).
inline i32 ar_update(const Ctx& c, const i32* const* ar_rows, int order,
                     i32 ar_idx, i32 dist_idx, const i32* coded, i64 i) {
  return c.ar.update(ar_rows, order, ar_idx, dist_idx, coded, i);
}

// Build the bypass symbol sequence for an out-of-range value, in the exact
// emission order used when encoding (see rans64.cpp:296-335): raw chunks
// high-to-low, then the remainder count, then full-count markers.
// Here we instead reproduce the reference's vector + reverse-pop order.
template <typename EmitFn>
inline void emit_bypass(u32 raw_val, u32 bypass_precision, u32 max_bypass_val, EmitFn emit) {
  i32 n_bypass = 0;
  while ((raw_val >> (n_bypass * bypass_precision)) != 0) ++n_bypass;

  std::vector<u16> seq;  // in reference push order
  i32 val = n_bypass;
  while (val >= static_cast<i32>(max_bypass_val)) {
    seq.push_back(static_cast<u16>(max_bypass_val));
    val -= max_bypass_val;
  }
  seq.push_back(static_cast<u16>(val));
  for (i32 j = 0; j < n_bypass; ++j) {
    seq.push_back(static_cast<u16>((raw_val >> (j * bypass_precision)) & max_bypass_val));
  }
  // Written back-to-front.
  for (auto it = seq.rbegin(); it != seq.rend(); ++it) emit(*it);
}

}  // namespace tpuans

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------
using namespace tpuans;

extern "C" {

void* rans_ctx_new(unsigned freq_precision, int bypass_coding, unsigned bypass_precision) {
  Ctx* c = new Ctx();
  c->freq_precision = freq_precision;
  c->bypass_coding = bypass_coding != 0;
  c->bypass_precision = bypass_precision;
  c->max_bypass_val = (1u << bypass_precision) - 1;
  return c;
}

void rans_ctx_free(void* h) { delete static_cast<Ctx*>(h); }

const char* rans_last_error(void* h) { return static_cast<Ctx*>(h)->error.c_str(); }

// pmf: float array of length n; out_cdf must hold n+1 i32. Returns 0 on ok.
int rans_pmf_to_quantized_cdf(const float* pmf, i64 n, int precision, i32* out_cdf) {
  std::vector<float> p(pmf, pmf + n);
  auto cdf = quantize_pmf(p, precision);
  if (cdf.empty()) return -1;
  std::memcpy(out_cdf, cdf.data(), sizeof(i32) * (n + 1));
  return 0;
}

// freqs: (num_dists, freq_stride) i32 row-major; num_symbols/offsets: (num_dists,).
// Matches init_params (rans64.cpp:128-159): pmf = freq/total with tail_mass=1
// appended, float32 sequential accumulation.
int rans_init_params(void* h, const i32* freqs, i64 freq_stride,
                     const i32* num_symbols, const i32* offsets, i64 num_dists) {
  Ctx* c = static_cast<Ctx*>(h);
  c->cdfs.assign(num_dists, {});
  c->cdf_sizes.assign(num_dists, 0);
  for (i64 d = 0; d < num_dists; ++d) {
    const i32 nsym = num_symbols[d];
    const i32* row = freqs + d * freq_stride;
    float total = 0.f;
    for (i32 i = 0; i < nsym; ++i) total += static_cast<float>(row[i]);
    total += 1.f;  // tail mass
    std::vector<float> pmf(nsym + 1);
    for (i32 i = 0; i < nsym; ++i) pmf[i] = static_cast<float>(row[i]) / total;
    pmf[nsym] = 1.f / total;
    auto cdf = quantize_pmf(pmf, static_cast<int>(c->freq_precision));
    if (cdf.empty()) {
      c->error = "degenerate pmf in rans_init_params";
      return -1;
    }
    c->cdfs[d] = std::move(cdf);
    c->cdf_sizes[d] = nsym + 2;
  }
  c->offsets.assign(offsets, offsets + num_dists);
  build_fast_tables(c);
  c->inited = true;
  return 0;
}

// cdfs: (num_dists, cdf_stride) i32 row-major; cdfs_sizes/offsets: (num_dists,).
int rans_init_cdf_params(void* h, const i32* cdfs, i64 cdf_stride,
                         const i32* cdfs_sizes, const i32* offsets, i64 num_dists) {
  Ctx* c = static_cast<Ctx*>(h);
  c->cdfs.assign(num_dists, {});
  c->cdf_sizes.assign(num_dists, 0);
  for (i64 d = 0; d < num_dists; ++d) {
    const i32 sz = cdfs_sizes[d];
    const i32* row = cdfs + d * cdf_stride;
    c->cdfs[d].assign(row, row + sz);
    c->cdf_sizes[d] = sz;
  }
  c->offsets.assign(offsets, offsets + num_dists);
  build_fast_tables(c);
  c->inited = true;
  return 0;
}

// ar_tables: flattened (num_tables, dist_dim, d1[, d2]) i32. order = 1 or 2.
int rans_init_ar_params(void* h, const i32* ar_tables, i64 num_tables,
                        i64 dist_dim, i64 d1, i64 d2, int order) {
  Ctx* c = static_cast<Ctx*>(h);
  if (c->ar.init_tables(ar_tables, num_tables, dist_dim, d1, d2, order) != 0) {
    c->error = "ar order must be 1 or 2";
    return -1;
  }
  return 0;
}

// Custom AR linear ops: n ops, each with `order` weights plus (bias, scale, lo, hi).
// weights: (n, order) row-major float; params: (n, 4) row-major float.
int rans_init_custom_ar_ops(void* h, const float* weights, const float* params,
                            i64 n, int order) {
  Ctx* c = static_cast<Ctx*>(h);
  return c->ar.init_ops(weights, params, n, order);
}

// Copy out c->cdfs as a dense (num_dists, max_size) array. Returns max_size.
i64 rans_get_cdfs(void* h, i32* out, i64 out_capacity) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) return 0;
  i64 max_sz = 0;
  for (auto s : c->cdf_sizes) max_sz = std::max<i64>(max_sz, s);
  if (out_capacity < max_sz * static_cast<i64>(c->cdfs.size())) return -(max_sz * c->cdfs.size());
  for (size_t d = 0; d < c->cdfs.size(); ++d) {
    std::memset(out + d * max_sz, 0, sizeof(i32) * max_sz);
    std::memcpy(out + d * max_sz, c->cdfs[d].data(), sizeof(i32) * c->cdfs[d].size());
  }
  return max_sz;
}

i64 rans_num_dists(void* h) { return static_cast<i64>(static_cast<Ctx*>(h)->cdfs.size()); }

// Encode n symbols. ar_rows: `order` pointers packed as (order, n) i32, or null.
// cache != 0 accumulates symbols for a later rans_flush. Returns byte length of
// the encoded stream (0 in cache mode), or -1 on error. Output retrieved via
// rans_copy_output.
i64 rans_encode_with_indexes(void* h, const i32* symbols, const i32* indexes, i64 n,
                             const i32* ar_indexes, const i32* ar_offsets, int ar_order_in,
                             int cache) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) {
    c->error = "coder not initialized";
    return -1;
  }
  const bool do_cache = cache != 0;
  const i32* ar_rows[3] = {nullptr, nullptr, nullptr};
  int order = 0;
  if (c->ar.inited) {
    if (ar_offsets == nullptr) {
      c->error = "ar_offsets required for AR coding";
      return -1;
    }
    order = ar_order_in;
    for (int k = 0; k < order; ++k) ar_rows[k] = ar_offsets + static_cast<i64>(k) * n;
  }

  u64 state = kLow;
  BackWriter w(do_cache ? 0 : static_cast<size_t>(2 * n + 16));

  for (i64 i = n - 1; i >= 0; --i) {
    i32 dist_idx = indexes[i];
    if (c->ar.inited) {
      const i32 ar_idx = (ar_indexes == nullptr) ? 0 : ar_indexes[i];
      dist_idx = ar_update(*c, ar_rows, order, ar_idx, dist_idx, symbols, i);
    }
    const auto& cdf = c->cdfs[dist_idx];
    const i32 max_value = c->cdf_sizes[dist_idx] - 2;
    i32 value = symbols[i] - c->offsets[dist_idx];

    u32 raw_val = 0;
    if (c->bypass_coding) {
      if (value < 0) {
        raw_val = static_cast<u32>(-2 * value - 1);
        value = max_value;
      } else if (value >= max_value) {
        raw_val = static_cast<u32>(2 * (value - max_value));
        value = max_value;
      }
    }

    if (c->bypass_coding && value == max_value) {
      if (!do_cache) {
        emit_bypass(raw_val, c->bypass_precision, c->max_bypass_val,
                    [&](u16 v) { enc_put_bits(&state, &w, v, c->bypass_precision); });
      } else {
        emit_bypass(raw_val, c->bypass_precision, c->max_bypass_val,
                    [&](u16 v) { c->cache.push_back({v, static_cast<u16>(v + 1), 1}); });
      }
    }

    if (!do_cache) {
      enc_put(&state, &w, c->enc_syms[dist_idx][value], c->freq_precision);
    } else {
      c->cache.push_back({static_cast<u16>(cdf[value]),
                          static_cast<u16>(cdf[value + 1] - cdf[value]), 0});
    }
  }

  if (do_cache) {
    c->out.clear();
    return 0;
  }
  enc_flush(state, &w);
  c->out.assign(reinterpret_cast<const char*>(w.buf.data() + w.pos), w.words() * 4);
  return static_cast<i64>(c->out.size());
}

// Flush cached symbols into one stream. Returns byte length.
i64 rans_flush(void* h) {
  Ctx* c = static_cast<Ctx*>(h);
  u64 state = kLow;
  BackWriter w(c->cache.size() + 16);
  for (const auto& sym : c->cache) {
    if (!sym.bypass) {
      EncSym es;
      enc_sym_init(&es, sym.start, sym.range, c->freq_precision);
      enc_put(&state, &w, es, c->freq_precision);
    } else {
      enc_put_bits(&state, &w, sym.start, c->bypass_precision);
    }
  }
  enc_flush(state, &w);
  c->cache.clear();
  c->out.assign(reinterpret_cast<const char*>(w.buf.data() + w.pos), w.words() * 4);
  return static_cast<i64>(c->out.size());
}

i64 rans_peek_cache_size(void* h) { return static_cast<i64>(static_cast<Ctx*>(h)->cache.size()); }

// out: (n, 3) i32 rows of (start, range, bypass).
void rans_peek_cache(void* h, i32* out) {
  Ctx* c = static_cast<Ctx*>(h);
  for (size_t i = 0; i < c->cache.size(); ++i) {
    out[i * 3 + 0] = c->cache[i].start;
    out[i * 3 + 1] = c->cache[i].range;
    out[i * 3 + 2] = c->cache[i].bypass;
  }
}

void rans_copy_output(void* h, u8* dst) {
  Ctx* c = static_cast<Ctx*>(h);
  std::memcpy(dst, c->out.data(), c->out.size());
}

namespace {

// Shared symbol-by-symbol decode step.
inline void decode_loop(Ctx* c, u64* state, FwdReader* r, const i32* indexes, i64 n,
                        const i32* ar_indexes, const i32* const* ar_rows, int order,
                        bool use_ar, i32* out) {
  for (i64 i = 0; i < n; ++i) {
    i32 dist_idx = indexes[i];
    if (use_ar) {
      const i32 ar_idx = (ar_indexes == nullptr) ? 0 : ar_indexes[i];
      dist_idx = ar_update(*c, ar_rows, order, ar_idx, dist_idx, out, i);
    }
    const auto& cdf = c->cdfs[dist_idx];
    const i32 max_value = c->cdf_sizes[dist_idx] - 2;
    const i32 offset = c->offsets[dist_idx];

    const u32 cum = dec_peek(*state, c->freq_precision);
    const i32 s = c->use_cum2sym
        ? static_cast<i32>(c->cum2sym[dist_idx][cum])
        : cdf_find_symbol(cdf.data(), c->cdf_sizes[dist_idx], cum);
    dec_advance(state, r, static_cast<u32>(cdf[s]),
                static_cast<u32>(cdf[s + 1] - cdf[s]), c->freq_precision);

    i32 value = s;
    if (c->bypass_coding && value == max_value) {
      u32 val = dec_get_bits(state, r, c->bypass_precision);
      u32 n_bypass = val;
      while (val == c->max_bypass_val) {
        val = dec_get_bits(state, r, c->bypass_precision);
        n_bypass += val;
      }
      u32 raw_val = 0;
      for (u32 j = 0; j < n_bypass; ++j) {
        val = dec_get_bits(state, r, c->bypass_precision);
        raw_val |= val << (j * c->bypass_precision);
      }
      value = static_cast<i32>(raw_val >> 1);
      if (raw_val & 1) {
        value = -value - 1;
      } else {
        value += max_value;
      }
    }
    out[i] = value + offset;
  }
}

}  // namespace

// Decode n symbols from a complete stream.
i64 rans_decode_with_indexes(void* h, const u8* stream, i64 nbytes, const i32* indexes,
                             i64 n, const i32* ar_indexes, const i32* ar_offsets,
                             int ar_order_in, i32* out) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) {
    c->error = "coder not initialized";
    return -1;
  }
  const i32* ar_rows[3] = {nullptr, nullptr, nullptr};
  int order = 0;
  const bool use_ar = c->ar.inited;
  if (use_ar) {
    if (ar_offsets == nullptr) {
      c->error = "ar_offsets required for AR coding";
      return -1;
    }
    order = ar_order_in;
    for (int k = 0; k < order; ++k) ar_rows[k] = ar_offsets + static_cast<i64>(k) * n;
  }
  FwdReader r{reinterpret_cast<const u32*>(stream)};
  u64 state;
  dec_init(&state, &r);
  decode_loop(c, &state, &r, indexes, n, ar_indexes, ar_rows, order, use_ar, out);
  (void)nbytes;
  return n;
}

// Streaming decode: set_stream once, then decode groups incrementally.
int rans_set_stream(void* h, const u8* stream, i64 nbytes) {
  Ctx* c = static_cast<Ctx*>(h);
  c->stream.assign(reinterpret_cast<const char*>(stream), nbytes);
  c->dec_reader.ptr = reinterpret_cast<const u32*>(c->stream.data());
  dec_init(&c->dec_state, &c->dec_reader);
  return 0;
}

i64 rans_decode_stream(void* h, const i32* indexes, i64 n, const i32* ar_indexes,
                       const i32* ar_offsets, int ar_order_in, i32* out) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) {
    c->error = "coder not initialized";
    return -1;
  }
  const i32* ar_rows[3] = {nullptr, nullptr, nullptr};
  int order = 0;
  const bool use_ar = c->ar.inited;
  if (use_ar) {
    if (ar_offsets == nullptr) {
      c->error = "ar_offsets required for AR coding";
      return -1;
    }
    order = ar_order_in;
    for (int k = 0; k < order; ++k) ar_rows[k] = ar_offsets + static_cast<i64>(k) * n;
  }
  decode_loop(c, &c->dec_state, &c->dec_reader, indexes, n, ar_indexes, ar_rows, order,
              use_ar, out);
  return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Interleaved-lane rANS encode (TPU-native mode).
//
// Lane assignment: within the symbol sequence, lane l owns positions p with
// p % num_lanes == l. Each lane is an independent rANS64 stream (reverse
// encode, 2-word flush at the head), so a SIMD/vector decoder can decode
// num_lanes symbols per step with no cross-lane dependencies. No bypass
// coding: all values must be in table range (callers use wide tables and
// fall back to the compat coder on overflow).
//
// Output layout: lane_words (num_lanes, max_words) u32 row-major padded
// with zeros + lane_counts (num_lanes) i32. rans_pack_lane_streams flattens
// to bytes for storage; the device decoder consumes the padded matrix.
// ---------------------------------------------------------------------------
extern "C" {

// Returns max_words across lanes, or -1 on error. lane_words must hold
// num_lanes * (2 + n/num_lanes + 4) u32; lane_counts holds num_lanes i32.
i64 rans_encode_interleaved(void* h, const i32* symbols, const i32* indexes,
                            i64 n, i64 num_lanes, u32* lane_words,
                            i64 words_stride, i32* lane_counts) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) {
    c->error = "coder not initialized";
    return -1;
  }
  i64 max_words = 0;
  std::vector<u32> buf;
  for (i64 l = 0; l < num_lanes; ++l) {
    // Lane symbol positions: l, l+L, l+2L, ... encode in REVERSE.
    const i64 count = (n - l + num_lanes - 1) / num_lanes;
    u64 state = kLow;
    BackWriter w(static_cast<size_t>(count) + 8);
    for (i64 k = count - 1; k >= 0; --k) {
      const i64 i = l + k * num_lanes;
      const i32 dist_idx = indexes[i];
      const i32 value = symbols[i] - c->offsets[dist_idx];
      if (value < 0 || value >= c->cdf_sizes[dist_idx] - 1) {
        c->error = "symbol out of table range (no bypass in interleaved mode)";
        return -1;
      }
      enc_put(&state, &w, c->enc_syms[dist_idx][value], c->freq_precision);
    }
    enc_flush(state, &w);
    const i64 nwords = static_cast<i64>(w.words());
    if (nwords > words_stride) {
      c->error = "lane stream exceeds stride";
      return -1;
    }
    std::memcpy(lane_words + l * words_stride, w.buf.data() + w.pos,
                nwords * 4);
    std::memset(lane_words + l * words_stride + nwords, 0,
                (words_stride - nwords) * 4);
    lane_counts[l] = static_cast<i32>(nwords);
    max_words = std::max(max_words, nwords);
  }
  return max_words;
}

// ---------------------------------------------------------------------------
// 32-bit-state interleaved rANS (TPU fused-decode lane format v2).
//
// Same lane assignment as rans_encode_interleaved, but each lane is a
// 32-bit-state rANS stream with 16-bit renormalization words: state in
// [2^16, 2^32), encode emits u16 words, flush writes two u16 (lo, hi).
// Chosen for the on-device decoder: the per-step update becomes pure
// uint32 arithmetic (one 16x16 multiply + adds — no 64-bit emulation on
// the VPU) and the per-lane flush halves (4 bytes vs 8), so lane count
// can double at equal rate overhead, halving the sequential step count.
// Requires 16-bit frequency precision (the default).
// ---------------------------------------------------------------------------
static constexpr u32 kLow32 = 1u << 16;

i64 rans32_encode_interleaved(void* h, const i32* symbols, const i32* indexes,
                              i64 n, i64 num_lanes, u16* lane_words,
                              i64 words_stride, i32* lane_counts) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) {
    c->error = "coder not initialized";
    return -1;
  }
  if (c->freq_precision != 16) {
    c->error = "rans32 interleaved mode requires 16-bit freq precision";
    return -1;
  }
  i64 max_words = 0;
  std::vector<u16> buf;
  for (i64 l = 0; l < num_lanes; ++l) {
    const i64 count = (n - l + num_lanes - 1) / num_lanes;
    u32 state = kLow32;
    buf.assign(static_cast<size_t>(count) + 4, 0);
    size_t pos = buf.size();
    for (i64 k = count - 1; k >= 0; --k) {
      const i64 i = l + k * num_lanes;
      const i32 dist_idx = indexes[i];
      const i32 value = symbols[i] - c->offsets[dist_idx];
      if (value < 0 || value >= c->cdf_sizes[dist_idx] - 1) {
        c->error = "symbol out of table range (no bypass in interleaved mode)";
        return -1;
      }
      const auto& cdf = c->cdfs[dist_idx];
      const u32 start = static_cast<u32>(cdf[value]);
      const u32 freq = static_cast<u32>(cdf[value + 1] - cdf[value]);
      if (static_cast<u64>(state) >= (static_cast<u64>(freq) << 16)) {
        buf[--pos] = static_cast<u16>(state);
        state >>= 16;
      }
      state = ((state / freq) << 16) + (state % freq) + start;
    }
    // flush head (lo, hi): decoder inits x = w0 | (w1 << 16)
    buf[--pos] = static_cast<u16>(state >> 16);
    buf[--pos] = static_cast<u16>(state);
    const i64 nwords = static_cast<i64>(buf.size() - pos);
    if (nwords > words_stride) {
      c->error = "lane stream exceeds stride";
      return -1;
    }
    std::memcpy(lane_words + l * words_stride, buf.data() + pos, nwords * 2);
    std::memset(lane_words + l * words_stride + nwords, 0,
                (words_stride - nwords) * 2);
    lane_counts[l] = static_cast<i32>(nwords);
    max_words = std::max(max_words, nwords);
  }
  return max_words;
}

// Reference (host) decoder for the rans32 lane format — used by tests and
// as the semantics spec for ops/rans_device.py decode_step32.
i64 rans32_decode_interleaved(void* h, const u16* lane_words, i64 words_stride,
                              const i32* indexes, i64 n, i64 num_lanes,
                              i32* out) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) return -1;
  std::vector<u32> states(num_lanes);
  std::vector<i64> ptrs(num_lanes);
  for (i64 l = 0; l < num_lanes; ++l) {
    const u16* p = lane_words + l * words_stride;
    states[l] = static_cast<u32>(p[0]) | (static_cast<u32>(p[1]) << 16);
    ptrs[l] = 2;
  }
  for (i64 i = 0; i < n; ++i) {
    const i64 l = i % num_lanes;
    const i32 dist_idx = indexes[i];
    const auto& cdf = c->cdfs[dist_idx];
    const u32 cum = states[l] & 0xFFFFu;
    const i32 s = c->use_cum2sym
        ? static_cast<i32>(c->cum2sym[dist_idx][cum])
        : cdf_find_symbol(cdf.data(), c->cdf_sizes[dist_idx], cum);
    const u32 freq = static_cast<u32>(cdf[s + 1] - cdf[s]);
    u32 x = freq * (states[l] >> 16) + cum - static_cast<u32>(cdf[s]);
    if (x < kLow32) {
      x = (x << 16) | lane_words[l * words_stride + ptrs[l]];
      ptrs[l]++;
    }
    states[l] = x;
    out[i] = s + c->offsets[dist_idx];
  }
  return n;
}

// Reference (host) decoder for the interleaved format — used by tests.
i64 rans_decode_interleaved(void* h, const u32* lane_words, i64 words_stride,
                            const i32* indexes, i64 n, i64 num_lanes, i32* out) {
  Ctx* c = static_cast<Ctx*>(h);
  if (!c->inited) return -1;
  std::vector<u64> states(num_lanes);
  std::vector<i64> ptrs(num_lanes);
  for (i64 l = 0; l < num_lanes; ++l) {
    const u32* p = lane_words + l * words_stride;
    states[l] = static_cast<u64>(p[0]) | (static_cast<u64>(p[1]) << 32);
    ptrs[l] = 2;
  }
  for (i64 i = 0; i < n; ++i) {
    const i64 l = i % num_lanes;
    const i32 dist_idx = indexes[i];
    const auto& cdf = c->cdfs[dist_idx];
    const u32 cum = static_cast<u32>(states[l] & ((1u << c->freq_precision) - 1));
    const i32 s = c->use_cum2sym
        ? static_cast<i32>(c->cum2sym[dist_idx][cum])
        : cdf_find_symbol(cdf.data(), c->cdf_sizes[dist_idx], cum);
    u64 x = states[l];
    x = static_cast<u64>(cdf[s + 1] - cdf[s]) * (x >> c->freq_precision) +
        cum - cdf[s];
    if (x < kLow) {
      x = (x << 32) | lane_words[l * words_stride + ptrs[l]];
      ptrs[l]++;
    }
    states[l] = x;
    out[i] = s + c->offsets[dist_idx];
  }
  return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Standalone autoregressive transforms (parity: the reference's `cbench.ar`
// module, csrc/ar/ar.cpp:42-125): subtract a neighbor-predicted value from
// every element (e.g. 3-way mean of left/top/top-left for image planes).
// Offsets are flat element distances (0 neighbors read as 0).
// forward: r[i] = x[i] - f(x[i-o0], ..)   (parallelizable)
// inverse: x[i] = r[i] + f(x[i-o0], ..)   (sequential scan)
// ---------------------------------------------------------------------------
extern "C" {

// modulus > 0 wraps values into [0, modulus) — the uint8 image case where
// residuals stay storable in one byte (prediction from exactly
// reconstructed neighbors keeps the wrap invertible).
void ar_transform_mean_forward(const i32* input, i64 n, const i64* offs,
                               int nways, i32 modulus, i32* out) {
  for (i64 i = 0; i < n; ++i) {
    i64 acc = 0;
    for (int k = 0; k < nways; ++k) {
      acc += (i >= offs[k]) ? input[i - offs[k]] : 0;
    }
    i64 v = input[i] - acc / nways;
    if (modulus > 0) v = ((v % modulus) + modulus) % modulus;
    out[i] = static_cast<i32>(v);
  }
}

void ar_transform_mean_inverse(const i32* residual, i64 n, const i64* offs,
                               int nways, i32 modulus, i32* out) {
  for (i64 i = 0; i < n; ++i) {
    i64 acc = 0;
    for (int k = 0; k < nways; ++k) {
      acc += (i >= offs[k]) ? out[i - offs[k]] : 0;
    }
    i64 v = residual[i] + acc / nways;
    if (modulus > 0) v = ((v % modulus) + modulus) % modulus;
    out[i] = static_cast<i32>(v);
  }
}

}  // extern "C"
