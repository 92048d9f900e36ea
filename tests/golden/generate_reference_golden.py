#!/usr/bin/env python
"""Generate golden bitstreams from the ACTUAL reference C++ coder.

Compiles the reference pybind11 module ``cbench.ans`` (sources at
/root/reference/cbench/csrc/ans/, header-only pybind11 vendored by torch)
into a scratch directory, drives it over fixed-seed cases mirroring the
reference's own tests/ans_test.py, and stores inputs + encoded byte strings
in ref_golden.npz.

The committed .npz is the test artifact; this script only needs re-running
when cases change, and requires the reference checkout. No reference source
code enters this repository — only compiled-output bitstreams used to verify
bit-exactness claims.
"""

import os
import subprocess
import sys
import sysconfig
import tempfile

import numpy as np

REF = "/root/reference/cbench/csrc/ans"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_golden.npz")


def build_reference_module():
    import torch

    import importlib.util

    build_dir = tempfile.mkdtemp(prefix="refans")
    torch_inc = os.path.join(os.path.dirname(torch.__file__), "include")
    py_inc = sysconfig.get_paths()["include"]
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    # Compile the full reference module (lib.cpp registers the coder classes
    # AND the ar-op factories: ar_linear_op, ar_limited_scaled_add_linear_op)
    # under its own module name "ans" and load it from file.
    so = os.path.join(build_dir, "ans" + ext)
    srcs = [os.path.join(REF, f) for f in
            ("rans64.cpp", "tans.cpp", "ans_interface.cpp", "lib.cpp")]
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-DNDEBUG", "-shared", "-fPIC",
         f"-I{torch_inc}", f"-I{py_inc}", f"-I{REF}"] + srcs + ["-o", so],
        check=True)
    spec = importlib.util.spec_from_file_location("ans", so)
    refans = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refans)
    return refans


def gen_params(rng, num_dists, num_symbols):
    freqs = rng.integers(1, 1024, (num_dists, num_symbols))
    nfreqs = np.zeros(num_dists, np.int64) + num_symbols
    offsets = np.zeros(num_dists, np.int64)
    return freqs, nfreqs, offsets


def main():
    refans = build_reference_module()
    out = {}
    rng = np.random.default_rng(1234)

    # Case 1: plain rANS64 with bypass symbols (ans_test.py:17-43 shape
    # shrunk for artifact size).
    num_dists, num_symbols, bypass_num = 8, 64, 16
    freqs, nfreqs, offsets = gen_params(rng, num_dists, num_symbols)
    data = rng.integers(0, num_symbols + bypass_num, (4, 3, 16, 16))
    indexes = rng.integers(0, num_dists, data.shape)
    enc = refans.Rans64Encoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    stream = enc.encode_with_indexes(data, indexes)
    out.update(c1_freqs=freqs, c1_nfreqs=nfreqs, c1_offsets=offsets,
               c1_data=data, c1_indexes=indexes,
               c1_stream=np.frombuffer(stream, np.uint8))

    # Case 2: no bypass, non-zero offsets.
    freqs2, nfreqs2, _ = gen_params(rng, num_dists, num_symbols)
    offsets2 = rng.integers(-20, 20, num_dists)
    data2 = rng.integers(0, num_symbols, (2, 8, 8)) + offsets2[
        rng.integers(0, num_dists, (2, 8, 8))]
    indexes2 = rng.integers(0, num_dists, data2.shape)
    # re-derive data so symbols stay in range per element's index
    indexes2 = rng.integers(0, num_dists, (2, 8, 8))
    data2 = rng.integers(0, num_symbols, (2, 8, 8)) + offsets2[indexes2]
    enc2 = refans.Rans64Encoder(bypass_coding=False)
    enc2.init_params(freqs2, nfreqs2, offsets2)
    stream2 = enc2.encode_with_indexes(data2, indexes2)
    out.update(c2_freqs=freqs2, c2_nfreqs=nfreqs2, c2_offsets=offsets2,
               c2_data=data2, c2_indexes=indexes2,
               c2_stream=np.frombuffer(stream2, np.uint8))

    # Case 3: autoregressive coding with a 4D lookup table
    # (ans_test.py:45-80): per-symbol dist index updated from two causal
    # neighbors.
    num_symbols3 = 16
    freqs3, nfreqs3, offsets3 = gen_params(rng, num_dists, num_symbols3)
    ar_dim_offsets = [[0, -1, 0], [0, 0, -1]]
    ar_table = rng.integers(
        0, num_dists,
        [1, num_dists] + [num_symbols3 + 1] * len(ar_dim_offsets))
    data3 = rng.integers(0, num_symbols3, (2, 3, 8, 8))
    indexes3 = rng.integers(0, num_dists, data3.shape)
    enc3 = refans.Rans64Encoder(bypass_coding=False)
    enc3.init_params(freqs3, nfreqs3, offsets3)
    enc3.init_ar_params(ar_table, [ar_dim_offsets])
    sys.path.insert(0, "/root/reference")
    from cbench.utils.ar_utils import create_ar_offsets
    ar_offsets = create_ar_offsets(indexes3.shape, ar_dim_offsets)
    ar_indexes = np.zeros_like(indexes3)
    stream3 = enc3.encode_with_indexes(
        data3, indexes3, ar_indexes=ar_indexes, ar_offsets=ar_offsets)
    out.update(c3_freqs=freqs3, c3_nfreqs=nfreqs3, c3_offsets=offsets3,
               c3_table=ar_table, c3_data=data3, c3_indexes=indexes3,
               c3_ar_offsets=np.asarray(ar_offsets),
               c3_stream=np.frombuffer(stream3, np.uint8))

    # Case 4: CDF-initialized coding + the quantized CDFs themselves
    # (ans_test.py:80-112) — checks pmf_to_quantized_cdf frequency stealing.
    pmfs = rng.random((num_dists, num_symbols)).astype(np.float32) + 1e-3
    pmfs /= pmfs.sum(axis=1, keepdims=True)
    cdfs = [refans.pmf_to_quantized_cdf(p.tolist() + [1e-8], 16)
            for p in pmfs]
    cdf_sizes = np.array([len(c) for c in cdfs])
    cdfs_np = np.zeros((num_dists, cdf_sizes.max()), np.int64)
    for i, c in enumerate(cdfs):
        cdfs_np[i, :len(c)] = np.array(c)
    data4 = rng.integers(0, num_symbols + bypass_num, (4, 16, 16))
    indexes4 = rng.integers(0, num_dists, data4.shape)
    enc4 = refans.Rans64Encoder(bypass_coding=True)
    enc4.init_cdf_params(cdfs_np, cdf_sizes, np.zeros(num_dists, np.int64))
    stream4 = enc4.encode_with_indexes(data4, indexes4)
    out.update(c4_pmfs=pmfs, c4_cdfs=cdfs_np, c4_sizes=cdf_sizes,
               c4_data=data4, c4_indexes=indexes4,
               c4_stream=np.frombuffer(stream4, np.uint8))

    # Case 5: streaming decode (set_stream/decode_stream) uses the same
    # stream as case 1 — no separate artifact needed; the test decodes c1 in
    # two chunks.

    # Case 6: tANS round-trip (ans_test.py:112-168).
    num_symbols6 = 32
    freqs6, nfreqs6, offsets6 = gen_params(rng, num_dists, num_symbols6)
    data6 = rng.integers(0, num_symbols6 + bypass_num, (2, 3, 16, 16))
    indexes6 = rng.integers(0, num_dists, data6.shape)
    enc6 = refans.TansEncoder(max_symbol_value=num_symbols6 - 1,
                              bypass_coding=True)
    enc6.init_params(freqs6, nfreqs6, offsets6)
    stream6 = enc6.encode_with_indexes(data6, indexes6)
    out.update(c6_freqs=freqs6, c6_nfreqs=nfreqs6, c6_offsets=offsets6,
               c6_data=data6, c6_indexes=indexes6,
               c6_stream=np.frombuffer(stream6, np.uint8))

    # Case 7: tANS with a 4D AR lookup table (ans_test.py:138-170, shrunk).
    num_symbols7 = 16
    freqs7, nfreqs7, offsets7 = gen_params(rng, num_dists, num_symbols7)
    ar_table7 = rng.integers(
        0, num_dists, [1, num_dists] + [num_symbols7 + 1] * 2)
    data7 = rng.integers(0, num_symbols7, (2, 3, 8, 8))
    indexes7 = rng.integers(0, num_dists, data7.shape)
    enc7 = refans.TansEncoder(max_symbol_value=num_symbols7 - 1)
    enc7.init_params(freqs7, nfreqs7, offsets7)
    enc7.init_ar_params(ar_table7, [ar_dim_offsets])
    ar_offsets7 = create_ar_offsets(indexes7.shape, ar_dim_offsets)
    stream7 = enc7.encode_with_indexes(
        data7, indexes7, ar_indexes=np.zeros_like(indexes7),
        ar_offsets=ar_offsets7)
    out.update(c7_freqs=freqs7, c7_nfreqs=nfreqs7, c7_offsets=offsets7,
               c7_table=ar_table7, c7_data=data7, c7_indexes=indexes7,
               c7_ar_offsets=np.asarray(ar_offsets7),
               c7_stream=np.frombuffer(stream7, np.uint8))

    # Case 8: rANS with custom linear AR ops (ans_interface.hpp:39-105,
    # ar_funcs.hpp:57-92 ar_limited_scaled_add_linear_op) — the op rewrites
    # the dist index from {index, causal neighbors} with clamped scaled-add.
    # Grid layout: 16 "mean" levels x 4 "scale" levels = 64 dists, so the
    # rewritten index always stays in range.
    num_dists8, num_symbols8 = 64, 16
    scale8, mean_levels8 = 4, 16
    freqs8, nfreqs8, offsets8 = gen_params(rng, num_dists8, num_symbols8)
    op_weights8 = rng.normal(0, 0.3, (2, 2)).astype(np.float32)
    op_bias8 = rng.normal(0, 0.5, 2).astype(np.float32)
    ops8 = [refans.ar_limited_scaled_add_linear_op(
        op_weights8[i].tolist(), float(op_bias8[i]), float(scale8),
        0.0, float(mean_levels8 - 1)) for i in range(2)]
    data8 = rng.integers(0, num_symbols8, (2, 3, 8, 8))
    indexes8 = rng.integers(0, num_dists8, data8.shape)
    ar_indexes8 = rng.integers(0, 2, data8.shape)
    ar_offsets8 = create_ar_offsets(indexes8.shape, ar_dim_offsets)
    enc8 = refans.Rans64Encoder(bypass_coding=False)
    enc8.init_params(freqs8, nfreqs8, offsets8)
    enc8.init_custom_ar_ops(ops8)
    stream8 = enc8.encode_with_indexes(
        data8, indexes8, ar_indexes=ar_indexes8, ar_offsets=ar_offsets8)
    # sanity: reference round-trips through its own decoder
    dec8 = refans.Rans64Decoder(bypass_coding=False)
    dec8.init_params(freqs8, nfreqs8, offsets8)
    dec8.init_custom_ar_ops(ops8)
    back8 = dec8.decode_with_indexes(
        stream8, indexes8, ar_indexes=ar_indexes8, ar_offsets=ar_offsets8)
    assert np.array_equal(np.asarray(back8), data8), "c8 reference roundtrip"
    out.update(c8_freqs=freqs8, c8_nfreqs=nfreqs8, c8_offsets=offsets8,
               c8_op_weights=op_weights8, c8_op_bias=op_bias8,
               c8_op_scale=np.int64(scale8),
               c8_op_max=np.int64(mean_levels8 - 1),
               c8_data=data8, c8_indexes=indexes8,
               c8_ar_indexes=ar_indexes8,
               c8_ar_offsets=np.asarray(ar_offsets8),
               c8_stream=np.frombuffer(stream8, np.uint8))

    # Case 9: tANS streaming decode uses the c6/c7 artifacts (set_stream +
    # decode_stream in chunks) — test-side only, no extra artifact.

    # Case 10: legacy cbench.rans BufferedRansEncoder two-chunk flush
    # (csrc/rans/rans_interface.cpp:107-238) — the stream the repo's
    # codecs/entropy_codecs.py Buffered pair must reproduce byte-for-byte.
    import importlib.util
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from generate_reference_module_golden import _build

    rans_dir, _ = _build(
        "rans", ["/root/reference/cbench/csrc/rans/rans_interface.cpp"],
        ["/root/reference/cbench/csrc/rans"])
    spec = importlib.util.spec_from_file_location(
        "rans", os.path.join(
            rans_dir, "rans" + sysconfig.get_config_var("EXT_SUFFIX")))
    refrans = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refrans)
    RefBuf = refrans.BufferedRansEncoder
    pmf_to_quantized_cdf_np = refrans.pmf_to_quantized_cdf_np

    def _tables(K, C, seed):
        r = np.random.default_rng(seed)
        pmf = r.random((C, K)).astype(np.float64) + 1e-3
        pmf /= pmf.sum(1, keepdims=True)
        pmf = np.concatenate([pmf, np.full((C, 1), 1e-10)], 1)
        cdfs = pmf_to_quantized_cdf_np(pmf, 16).astype(np.int32)
        return cdfs, np.full(C, K + 2, np.int32), np.zeros(C, np.int32)

    t1, t2 = _tables(8, 3, 10), _tables(16, 2, 11)
    d1 = rng.integers(0, 8, 200).astype(np.int32)
    i1 = rng.integers(0, 3, 200).astype(np.int32)
    d2 = rng.integers(0, 16, 150).astype(np.int32)
    i2 = rng.integers(0, 2, 150).astype(np.int32)
    buf = RefBuf()
    buf.encode_with_indexes_np(d1, i1, *t1)
    buf.encode_with_indexes_np(d2, i2, *t2)
    out.update(c10_cdfs1=t1[0], c10_sizes1=t1[1], c10_offsets1=t1[2],
               c10_cdfs2=t2[0], c10_sizes2=t2[1], c10_offsets2=t2[2],
               c10_data1=d1, c10_indexes1=i1, c10_data2=d2, c10_indexes2=i2,
               c10_stream=np.frombuffer(bytes(buf.flush()), np.uint8))

    # Preserve any previously generated arrays byte-for-byte (the committed
    # artifact for c1-c6 was independently verified in round 2).
    if os.path.exists(OUT):
        old = np.load(OUT)
        for k in old.files:
            if k not in out:
                out[k] = old[k]

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: " + ", ".join(
        f"{k}={len(v)}B" for k, v in out.items() if k.endswith("stream")))


if __name__ == "__main__":
    main()
