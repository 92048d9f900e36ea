// tanscoder.cpp — table-based ANS (tANS / zstd-FSE style) host backend.
//
// Fresh implementation of the bitstream format used by the reference's tANS
// coder (behavioral contract from cbench/csrc/ans/tans.{hpp,cpp} and the
// vendored FSE sources): per-distribution FSE coding tables at a fixed
// table_log, FSE count normalization (with the secondary M2 fallback),
// zstd bit-stream layout (LSB-first forward write, backward read with end
// mark), out-of-range values folded onto the last table symbol with
// sign-folded 4-bit chunks coded through a dedicated uniform bypass table,
// and the same in-loop autoregression hooks as the rANS coder.
//
// Exported as a C API for ctypes; built into the same shared library as
// anscoder.cpp.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "ar_ops.hpp"

namespace tpuans {
namespace tans {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i16 = int16_t;
using i32 = int32_t;
using i64 = int64_t;

inline u32 highbit32(u32 v) { return 31 - __builtin_clz(v); }

// ---------------------------------------------------------------------------
// FSE count normalization (contract: Tans_normalizeCount / Tans_normalizeM2,
// reference tans.cpp:27-148 — itself the public zstd FSE algorithm).
// Returns 0 on success, -1 on error, +1 for the RLE special case.
// ---------------------------------------------------------------------------
int normalize_m2(i16* norm, u32 table_log, const u32* count, u64 total, u32 max_sym) {
  u32 distributed = 0;
  u32 low_threshold = static_cast<u32>(total >> table_log);
  u32 low_one = static_cast<u32>((total * 3) >> (table_log + 1));

  for (u32 s = 0; s <= max_sym; s++) {
    if (count[s] == 0) { norm[s] = 0; continue; }
    if (count[s] <= low_threshold) { norm[s] = -1; distributed++; total -= count[s]; continue; }
    if (count[s] <= low_one) { norm[s] = 1; distributed++; total -= count[s]; continue; }
    norm[s] = -2;
  }
  u32 to_distribute = (1u << table_log) - distributed;

  if (to_distribute == 0) return -1;
  if ((total / to_distribute) > low_one) {
    low_one = static_cast<u32>((total * 3) / (to_distribute * 2));
    for (u32 s = 0; s <= max_sym; s++) {
      if ((norm[s] == -2) && (count[s] <= low_one)) {
        norm[s] = 1; distributed++; total -= count[s];
      }
    }
    to_distribute = (1u << table_log) - distributed;
  }

  if (distributed == max_sym + 1) {
    u32 max_v = 0, max_c = 0;
    for (u32 s = 0; s <= max_sym; s++)
      if (count[s] > max_c) { max_v = s; max_c = count[s]; }
    norm[max_v] += static_cast<i16>(to_distribute);
    return 0;
  }

  const u64 v_step_log = 62 - table_log;
  const u64 mid = (1ull << (v_step_log - 1)) - 1;
  const u64 r_step = (((1ull << v_step_log) * to_distribute) + mid) / total;
  u64 tmp_total = mid;
  for (u32 s = 0; s <= max_sym; s++) {
    if (norm[s] == -2) {
      const u64 end = tmp_total + count[s] * r_step;
      const u32 s_start = static_cast<u32>(tmp_total >> v_step_log);
      const u32 s_end = static_cast<u32>(end >> v_step_log);
      const u32 weight = s_end - s_start;
      if (weight < 1) return -1;
      norm[s] = static_cast<i16>(weight);
      tmp_total = end;
    }
  }
  return 0;
}

int normalize_count(i16* norm, u32 table_log, const u32* count, u64 total, u32 max_sym) {
  static const u32 rtb_table[] = {0, 473195, 504333, 520860, 550000,
                                  700000, 750000, 830000};
  if (total == 0) return -1;
  const u64 scale = 62 - table_log;
  const u64 step = (1ull << 62) / total;
  const u64 v_step = 1ull << (scale - 20);
  i64 still_to_distribute = 1 << table_log;
  u32 largest = 0;
  i16 largest_p = 0;
  const u32 low_threshold = static_cast<u32>(total >> table_log);

  for (u32 s = 0; s <= max_sym; s++) {
    if (count[s] == total) return 1;  // RLE special case
    if (count[s] == 0) { norm[s] = 0; continue; }
    if (count[s] <= low_threshold) {
      norm[s] = -1;
      still_to_distribute--;
    } else {
      i16 proba = static_cast<i16>((count[s] * step) >> scale);
      if (proba < 8) {
        const u64 rest_to_beat = v_step * rtb_table[proba];
        proba += (count[s] * step) - (static_cast<u64>(proba) << scale) > rest_to_beat;
      }
      if (proba > largest_p) { largest_p = proba; largest = s; }
      norm[s] = proba;
      still_to_distribute -= proba;
    }
  }
  if (-still_to_distribute >= (norm[largest] >> 1)) {
    return normalize_m2(norm, table_log, count, total, max_sym);
  }
  norm[largest] += static_cast<i16>(still_to_distribute);
  return 0;
}

// ---------------------------------------------------------------------------
// Coding tables.
// ---------------------------------------------------------------------------
struct SymbolTT {
  i32 delta_nb_bits;
  i32 delta_find_state;
};

struct CTable {
  u32 table_log = 0;
  u32 max_symbol = 0;
  std::vector<u16> next_state;  // sorted by symbol, gives next state value
  std::vector<SymbolTT> symbol_tt;
};

struct DEntry {
  u32 new_state;
  u16 symbol;
  u16 nb_bits;
};

struct DTable {
  u32 table_log = 0;
  u32 max_symbol = 0;
  std::vector<DEntry> entries;
};

inline u32 table_step(u32 table_size) {
  return (table_size >> 1) + (table_size >> 3) + 3;
}

int build_ctable(CTable* ct, const i16* norm, u32 max_sym, u32 table_log) {
  const u32 table_size = 1u << table_log;
  const u32 table_mask = table_size - 1;
  const u32 step = table_step(table_size);
  ct->table_log = table_log;
  ct->max_symbol = max_sym;
  ct->next_state.assign(table_size, 0);
  ct->symbol_tt.assign(max_sym + 1, {0, 0});

  std::vector<u32> cumul(max_sym + 2);
  std::vector<u16> table_symbol(table_size);
  u32 high_threshold = table_size - 1;

  cumul[0] = 0;
  for (u32 u = 1; u <= max_sym + 1; u++) {
    if (norm[u - 1] == -1) {
      cumul[u] = cumul[u - 1] + 1;
      table_symbol[high_threshold--] = static_cast<u16>(u - 1);
    } else {
      cumul[u] = cumul[u - 1] + norm[u - 1];
    }
  }
  cumul[max_sym + 1] = table_size + 1;

  u32 position = 0;
  for (u32 symbol = 0; symbol <= max_sym; symbol++) {
    for (int n = 0; n < norm[symbol]; n++) {
      table_symbol[position] = static_cast<u16>(symbol);
      position = (position + step) & table_mask;
      while (position > high_threshold) position = (position + step) & table_mask;
    }
  }
  if (position != 0) return -1;

  for (u32 u = 0; u < table_size; u++) {
    const u16 s = table_symbol[u];
    ct->next_state[cumul[s]++] = static_cast<u16>(table_size + u);
  }

  u32 total = 0;
  for (u32 s = 0; s <= max_sym; s++) {
    switch (norm[s]) {
      case 0: break;
      case -1:
      case 1:
        ct->symbol_tt[s].delta_nb_bits = (table_log << 16) - (1 << table_log);
        ct->symbol_tt[s].delta_find_state = static_cast<i32>(total) - 1;
        total++;
        break;
      default: {
        const u32 max_bits_out = table_log - highbit32(norm[s] - 1);
        const u32 min_state_plus = norm[s] << max_bits_out;
        ct->symbol_tt[s].delta_nb_bits = (max_bits_out << 16) - min_state_plus;
        ct->symbol_tt[s].delta_find_state = static_cast<i32>(total) - norm[s];
        total += norm[s];
      }
    }
  }
  return 0;
}

int build_dtable(DTable* dt, const i16* norm, u32 max_sym, u32 table_log) {
  const u32 table_size = 1u << table_log;
  const u32 table_mask = table_size - 1;
  const u32 step = table_step(table_size);
  dt->table_log = table_log;
  dt->max_symbol = max_sym;
  dt->entries.assign(table_size, {0, 0, 0});

  std::vector<u16> symbol_next(max_sym + 1);
  u32 high_threshold = table_size - 1;
  for (u32 s = 0; s <= max_sym; s++) {
    if (norm[s] == -1) {
      dt->entries[high_threshold--].symbol = static_cast<u16>(s);
      symbol_next[s] = 1;
    } else {
      symbol_next[s] = norm[s];
    }
  }

  u32 position = 0;
  for (u32 s = 0; s <= max_sym; s++) {
    for (int n = 0; n < norm[s]; n++) {
      dt->entries[position].symbol = static_cast<u16>(s);
      position = (position + step) & table_mask;
      while (position > high_threshold) position = (position + step) & table_mask;
    }
  }
  if (position != 0) return -1;

  for (u32 u = 0; u < table_size; u++) {
    const u16 symbol = dt->entries[u].symbol;
    const u16 next = symbol_next[symbol]++;
    dt->entries[u].nb_bits = static_cast<u16>(table_log - highbit32(next));
    dt->entries[u].new_state =
        (static_cast<u32>(next) << dt->entries[u].nb_bits) - table_size;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// zstd-style bitstream (LSB-first forward write; backward read w/ end mark).
// ---------------------------------------------------------------------------
struct BitWriter {
  std::vector<u8> buf;
  size_t byte_pos = 0;
  u64 container = 0;
  u32 bit_pos = 0;

  explicit BitWriter(size_t capacity) : buf(capacity + 16, 0) {}

  inline void add_bits(u64 value, u32 nbits) {
    container |= (value & ((1ull << nbits) - 1)) << bit_pos;
    bit_pos += nbits;
  }

  inline void flush() {
    const u32 nbytes = bit_pos >> 3;
    std::memcpy(&buf[byte_pos], &container, sizeof(u64));
    byte_pos += nbytes;
    bit_pos &= 7;
    container >>= nbytes * 8;
  }

  size_t close() {
    add_bits(1, 1);  // end mark
    flush();
    return byte_pos + (bit_pos > 0);
  }
};

struct BitReader {
  const u8* start;
  i64 ptr;  // byte index of the container window
  u64 container = 0;
  u32 bits_consumed = 0;
  i64 size;

  int init(const u8* src, i64 src_size) {
    start = src;
    size = src_size;
    if (src_size < 1) return -1;
    const u8 last = src[src_size - 1];
    if (last == 0) return -1;  // end mark missing
    if (src_size >= 8) {
      ptr = src_size - 8;
      std::memcpy(&container, src + ptr, 8);
      bits_consumed = 8 - highbit32(last);  // consumes the end mark too
    } else {
      ptr = 0;
      container = src[0];
      // Mirror the reference's partial-container fill (bitstream.h:276-289).
      if (src_size >= 7) container += static_cast<u64>(src[6]) << (64 - 16);
      if (src_size >= 6) container += static_cast<u64>(src[5]) << (64 - 24);
      if (src_size >= 5) container += static_cast<u64>(src[4]) << (64 - 32);
      if (src_size >= 4) container += static_cast<u64>(src[3]) << 24;
      if (src_size >= 3) container += static_cast<u64>(src[2]) << 16;
      if (src_size >= 2) container += static_cast<u64>(src[1]) << 8;
      bits_consumed = 8 - highbit32(last);  // consumes the end mark too
      bits_consumed += static_cast<u32>(8 - src_size) * 8;
    }
    return 0;
  }

  inline u64 look_bits(u32 nbits) const {
    const u32 mask = 63;
    return (container << (bits_consumed & mask)) >> 1 >> ((mask - nbits) & mask);
  }

  inline u64 read_bits(u32 nbits) {
    const u64 v = look_bits(nbits);
    bits_consumed += nbits;
    return v;
  }

  inline void reload() {
    if (bits_consumed > 64) return;  // overflow; corrupted stream
    if (ptr >= 8) {
      ptr -= bits_consumed >> 3;
      bits_consumed &= 7;
      std::memcpy(&container, start + ptr, 8);
    } else if (ptr > 0) {
      const i64 nbytes = std::min<i64>(bits_consumed >> 3, ptr);
      ptr -= nbytes;
      bits_consumed -= static_cast<u32>(nbytes) * 8;
      std::memcpy(&container, start + ptr, 8);
    }
    // ptr == 0: container already holds the stream head; nothing to do.
  }
};

// ---------------------------------------------------------------------------
// Codec context.
// ---------------------------------------------------------------------------
struct CacheSym {
  u16 value;
  u16 index;
  u8 bypass;
};

struct TansCtx {
  u32 table_log = 10;
  u32 max_symbol_value = 255;
  bool bypass_coding = false;
  u32 bypass_precision = 4;
  u32 max_bypass_val = 15;
  bool inited = false;

  std::vector<CTable> ctables;
  std::vector<DTable> dtables;
  CTable bypass_ct;
  DTable bypass_dt;
  std::vector<i32> offsets;

  ArState ar;
  std::vector<CacheSym> cache;

  std::string stream;   // decoder stream state
  BitReader reader{};
  u64 dec_state = 0;
  bool stream_ready = false;

  std::string out;
  std::string error;
};

int build_tables_for(TansCtx* c, const i32* freqs, i64 freq_stride,
                     const i32* num_symbols, i64 num_dists, bool enc, bool dec) {
  c->ctables.assign(enc ? num_dists : 0, {});
  c->dtables.assign(dec ? num_dists : 0, {});
  for (i64 d = 0; d < num_dists; ++d) {
    const u32 nsym = static_cast<u32>(num_symbols[d]);
    std::vector<u32> count(nsym);
    u64 total = 0;
    for (u32 i = 0; i < nsym; ++i) {
      count[i] = static_cast<u32>(freqs[d * freq_stride + i]);
      total += count[i];
    }
    std::vector<i16> norm(nsym);
    const int rc = normalize_count(norm.data(), c->table_log, count.data(),
                                   total, nsym - 1);
    if (rc != 0) {
      c->error = "tans normalization failed";
      return -1;
    }
    if (enc && build_ctable(&c->ctables[d], norm.data(), nsym - 1, c->table_log)) {
      c->error = "ctable build failed";
      return -1;
    }
    if (dec && build_dtable(&c->dtables[d], norm.data(), nsym - 1, c->table_log)) {
      c->error = "dtable build failed";
      return -1;
    }
  }
  if (c->bypass_coding) {
    const u32 nb = c->max_bypass_val + 1;
    std::vector<u32> count(nb, 1);
    std::vector<i16> norm(nb);
    if (normalize_count(norm.data(), c->table_log, count.data(), nb,
                        c->max_bypass_val) != 0) {
      c->error = "bypass normalization failed";
      return -1;
    }
    if (enc && build_ctable(&c->bypass_ct, norm.data(), c->max_bypass_val,
                            c->table_log)) return -1;
    if (dec && build_dtable(&c->bypass_dt, norm.data(), c->max_bypass_val,
                            c->table_log)) return -1;
  }
  return 0;
}

inline void encode_symbol(BitWriter* w, const CTable& ct, u64* state, u16 symbol) {
  const SymbolTT& tt = ct.symbol_tt[symbol];
  const u32 nbits = static_cast<u32>((*state + tt.delta_nb_bits) >> 16);
  w->add_bits(*state, nbits);
  *state = ct.next_state[(*state >> nbits) + tt.delta_find_state];
  w->flush();
}

inline u16 decode_symbol(BitReader* r, const DTable& dt, u64* state) {
  const DEntry& e = dt.entries[*state];
  const u64 low = r->read_bits(e.nb_bits);
  *state = e.new_state + low;
  return e.symbol;
}

}  // namespace tans
}  // namespace tpuans

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------
using namespace tpuans;
using namespace tpuans::tans;

extern "C" {

void* tans_ctx_new(unsigned table_log, unsigned max_symbol_value,
                   int bypass_coding, unsigned bypass_precision) {
  TansCtx* c = new TansCtx();
  c->table_log = table_log;
  c->max_symbol_value = max_symbol_value;
  c->bypass_coding = bypass_coding != 0;
  c->bypass_precision = bypass_precision;
  c->max_bypass_val = (1u << bypass_precision) - 1;
  return c;
}

void tans_ctx_free(void* h) { delete static_cast<TansCtx*>(h); }

const char* tans_last_error(void* h) { return static_cast<TansCtx*>(h)->error.c_str(); }

int tans_init_params(void* h, const int32_t* freqs, int64_t freq_stride,
                     const int32_t* num_symbols, const int32_t* offsets,
                     int64_t num_dists, int build_enc, int build_dec) {
  TansCtx* c = static_cast<TansCtx*>(h);
  if (build_tables_for(c, freqs, freq_stride, num_symbols, num_dists,
                       build_enc != 0, build_dec != 0) != 0) {
    return -1;
  }
  c->offsets.assign(offsets, offsets + num_dists);
  c->inited = true;
  return 0;
}

int tans_init_ar_params(void* h, const int32_t* ar_tables, int64_t num_tables,
                        int64_t dist_dim, int64_t d1, int64_t d2, int order) {
  TansCtx* c = static_cast<TansCtx*>(h);
  return c->ar.init_tables(ar_tables, num_tables, dist_dim, d1, d2, order);
}

int tans_init_custom_ar_ops(void* h, const float* weights, const float* params,
                            int64_t n, int order) {
  TansCtx* c = static_cast<TansCtx*>(h);
  return c->ar.init_ops(weights, params, n, order);
}

int64_t tans_encode_with_indexes(void* h, const int32_t* symbols,
                                 const int32_t* indexes, int64_t n,
                                 const int32_t* ar_indexes, const int32_t* ar_offsets,
                                 int ar_order, int cache) {
  TansCtx* c = static_cast<TansCtx*>(h);
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
    order = ar_order;
    for (int k = 0; k < order; ++k) ar_rows[k] = ar_offsets + static_cast<i64>(k) * n;
  }

  BitWriter w(do_cache ? 0 : static_cast<size_t>(n) * (c->table_log + 8) / 8 + 64);
  u64 state = 1ull << c->table_log;

  for (i64 i = n - 1; i >= 0; --i) {
    i32 table_idx = indexes[i];
    if (c->ar.inited) {
      const i32 ar_idx = (ar_indexes == nullptr) ? 0 : ar_indexes[i];
      table_idx = c->ar.update(ar_rows, order, ar_idx, table_idx, symbols, i);
    }
    const CTable& ct = c->ctables[table_idx];
    const i32 max_value = static_cast<i32>(ct.max_symbol);
    i32 value = symbols[i] - c->offsets[table_idx];

    u32 raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<u32>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<u32>(2 * (value - max_value));
      value = max_value;
    }

    if (c->bypass_coding && value == max_value) {
      i32 n_bypass = 0;
      while ((raw_val >> (n_bypass * c->bypass_precision)) != 0) ++n_bypass;
      std::vector<u16> seq;
      i32 val = n_bypass;
      while (val >= static_cast<i32>(c->max_bypass_val)) {
        seq.push_back(static_cast<u16>(c->max_bypass_val));
        val -= c->max_bypass_val;
      }
      seq.push_back(static_cast<u16>(val));
      for (i32 j = 0; j < n_bypass; ++j) {
        seq.push_back(static_cast<u16>((raw_val >> (j * c->bypass_precision))
                                       & c->max_bypass_val));
      }
      if (!do_cache) {
        for (auto it = seq.rbegin(); it != seq.rend(); ++it) {
          encode_symbol(&w, c->bypass_ct, &state, *it);
        }
      } else {
        for (auto it = seq.rbegin(); it != seq.rend(); ++it) {
          c->cache.push_back({*it, 0, 1});
        }
      }
    }

    if (!do_cache) {
      encode_symbol(&w, ct, &state, static_cast<u16>(value));
    } else {
      c->cache.push_back({static_cast<u16>(value),
                          static_cast<u16>(table_idx), 0});
    }
  }

  if (do_cache) {
    c->out.clear();
    return 0;
  }
  w.add_bits(state, c->table_log);
  w.flush();
  const size_t nbytes = w.close();
  c->out.assign(reinterpret_cast<const char*>(w.buf.data()), nbytes);
  return static_cast<i64>(c->out.size());
}

int64_t tans_flush(void* h) {
  TansCtx* c = static_cast<TansCtx*>(h);
  BitWriter w(c->cache.size() * (c->table_log + 8) / 8 + 64);
  u64 state = 1ull << c->table_log;
  for (const auto& sym : c->cache) {
    if (!sym.bypass) {
      encode_symbol(&w, c->ctables[sym.index], &state, sym.value);
    } else {
      encode_symbol(&w, c->bypass_ct, &state, sym.value);
    }
  }
  c->cache.clear();
  w.add_bits(state, c->table_log);
  w.flush();
  const size_t nbytes = w.close();
  c->out.assign(reinterpret_cast<const char*>(w.buf.data()), nbytes);
  return static_cast<i64>(c->out.size());
}

void tans_copy_output(void* h, uint8_t* dst) {
  TansCtx* c = static_cast<TansCtx*>(h);
  std::memcpy(dst, c->out.data(), c->out.size());
}

namespace {

void tans_decode_loop(TansCtx* c, BitReader* r, u64* state, const i32* indexes,
                      i64 n, const i32* ar_indexes, const i32* const* ar_rows,
                      int order, i32* out) {
  for (i64 i = 0; i < n; ++i) {
    i32 table_idx = indexes[i];
    if (c->ar.inited) {
      const i32 ar_idx = (ar_indexes == nullptr) ? 0 : ar_indexes[i];
      table_idx = c->ar.update(ar_rows, order, ar_idx, table_idx, out, i);
    }
    const DTable& dt = c->dtables[table_idx];
    const i32 max_value = static_cast<i32>(dt.max_symbol);
    const i32 offset = c->offsets[table_idx];

    r->reload();
    i32 value = static_cast<i32>(decode_symbol(r, dt, state));

    if (c->bypass_coding && value == max_value) {
      u32 val = decode_symbol(r, c->bypass_dt, state);
      r->reload();
      u32 n_bypass = val;
      while (val == c->max_bypass_val) {
        val = decode_symbol(r, c->bypass_dt, state);
        r->reload();
        n_bypass += val;
      }
      u32 raw_val = 0;
      for (u32 j = 0; j < n_bypass; ++j) {
        val = decode_symbol(r, c->bypass_dt, state);
        r->reload();
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

int64_t tans_decode_with_indexes(void* h, const uint8_t* stream, int64_t nbytes,
                                 const int32_t* indexes, int64_t n,
                                 const int32_t* ar_indexes, const int32_t* ar_offsets,
                                 int ar_order, int32_t* out) {
  TansCtx* c = static_cast<TansCtx*>(h);
  if (!c->inited) {
    c->error = "coder not initialized";
    return -1;
  }
  const i32* ar_rows[3] = {nullptr, nullptr, nullptr};
  int order = 0;
  if (c->ar.inited) {
    if (ar_offsets == nullptr) {
      c->error = "ar_offsets required for AR coding";
      return -1;
    }
    order = ar_order;
    for (int k = 0; k < order; ++k) ar_rows[k] = ar_offsets + static_cast<i64>(k) * n;
  }
  BitReader r;
  if (r.init(stream, nbytes) != 0) {
    c->error = "invalid tans stream";
    return -1;
  }
  u64 state = r.read_bits(c->table_log);
  r.reload();
  tans_decode_loop(c, &r, &state, indexes, n, ar_indexes, ar_rows, order, out);
  return n;
}

int tans_set_stream(void* h, const uint8_t* stream, int64_t nbytes) {
  TansCtx* c = static_cast<TansCtx*>(h);
  c->stream.assign(reinterpret_cast<const char*>(stream), nbytes);
  if (c->reader.init(reinterpret_cast<const u8*>(c->stream.data()),
                     static_cast<i64>(c->stream.size())) != 0) {
    c->error = "invalid tans stream";
    return -1;
  }
  c->dec_state = c->reader.read_bits(c->table_log);
  c->reader.reload();
  c->stream_ready = true;
  return 0;
}

int64_t tans_decode_stream(void* h, const int32_t* indexes, int64_t n,
                           const int32_t* ar_indexes, const int32_t* ar_offsets,
                           int ar_order, int32_t* out) {
  TansCtx* c = static_cast<TansCtx*>(h);
  if (!c->inited || !c->stream_ready) {
    c->error = "coder/stream not initialized";
    return -1;
  }
  const i32* ar_rows[3] = {nullptr, nullptr, nullptr};
  int order = 0;
  if (c->ar.inited) {
    if (ar_offsets == nullptr) {
      c->error = "ar_offsets required";
      return -1;
    }
    order = ar_order;
    for (int k = 0; k < order; ++k) ar_rows[k] = ar_offsets + static_cast<i64>(k) * n;
  }
  tans_decode_loop(c, &c->reader, &c->dec_state, indexes, n, ar_indexes,
                   ar_rows, order, out);
  return n;
}

}  // extern "C"
