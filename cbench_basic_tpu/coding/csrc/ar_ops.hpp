// ar_ops.hpp — shared in-loop autoregression support for the ANS coders.
//
// Contract (reference ans_interface.hpp:58-105, ar_funcs.hpp:57-92): each
// symbol's distribution/table index may be rewritten from previously coded
// neighbor symbols, either through 3D/4D lookup tables (neighbor symbol + 1,
// 0 when out of bounds) or through a clamped scaled-add linear op.

#pragma once

#include <cmath>
#include <cstdint>
#include <vector>

namespace tpuans {

struct ArLinearOp {
  std::vector<float> weight;
  float bias = 0.f, scale = 1.f, lo = 0.f, hi = 0.f;

  inline int32_t apply(int32_t index, const int32_t* vals, int nvals) const {
    const float base = static_cast<float>(index);
    const float base_unscaled = std::floor(base / scale);
    float adder = 0.f;
    for (int i = 0; i < nvals; ++i) adder += static_cast<float>(vals[i]) * weight[i];
    adder += bias;
    adder = std::round(std::max(lo, std::min(hi, base_unscaled + adder))) - base_unscaled;
    return static_cast<int32_t>(base + adder * scale);
  }
};

struct ArState {
  bool inited = false;
  int order = 0;
  int64_t dim_index = 0, dim1 = 0, dim2 = 0;
  std::vector<std::vector<int32_t>> tables;  // flattened per table
  std::vector<ArLinearOp> ops;

  int init_tables(const int32_t* ar_tables, int64_t num_tables, int64_t dist_dim,
                  int64_t d1, int64_t d2, int ord) {
    if (ord < 1 || ord > 2) return -1;
    order = ord;
    dim_index = dist_dim;
    dim1 = d1;
    dim2 = (ord == 2) ? d2 : 1;
    const int64_t elems = dist_dim * d1 * (ord == 2 ? d2 : 1);
    tables.assign(num_tables, {});
    for (int64_t t = 0; t < num_tables; ++t) {
      tables[t].assign(ar_tables + t * elems, ar_tables + (t + 1) * elems);
    }
    inited = true;
    return 0;
  }

  int init_ops(const float* weights, const float* params, int64_t n, int ord) {
    ops.assign(n, {});
    for (int64_t i = 0; i < n; ++i) {
      ops[i].weight.assign(weights + i * ord, weights + (i + 1) * ord);
      ops[i].bias = params[i * 4 + 0];
      ops[i].scale = params[i * 4 + 1];
      ops[i].lo = params[i * 4 + 2];
      ops[i].hi = params[i * 4 + 3];
    }
    order = ord;
    inited = n > 0;
    return 0;
  }

  // `coded` = input symbols when encoding, output-so-far when decoding.
  inline int32_t update(const int32_t* const* ar_rows, int ord, int32_t ar_idx,
                        int32_t dist_idx, const int32_t* coded, int64_t i) const {
    if (!ops.empty()) {
      int32_t vals[3];
      for (int k = 0; k < ord; ++k) {
        const int32_t off = ar_rows[k][i];
        vals[k] = off > 0 ? coded[i - off] : 0;
      }
      return ops[ar_idx].apply(dist_idx, vals, ord);
    }
    const auto& tab = tables[ar_idx];
    if (ord == 1) {
      const int32_t off = ar_rows[0][i];
      const int32_t v = off > 0 ? coded[i - off] + 1 : 0;
      return tab[dist_idx * dim1 + v];
    }
    const int32_t off0 = ar_rows[0][i];
    const int32_t off1 = ar_rows[1][i];
    const int32_t v0 = off0 > 0 ? coded[i - off0] + 1 : 0;
    const int32_t v1 = off1 > 0 ? coded[i - off1] + 1 : 0;
    return tab[(dist_idx * dim1 + v0) * dim2 + v1];
  }
};

}  // namespace tpuans
