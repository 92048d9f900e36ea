"""Bit-exactness against bitstreams produced by the ACTUAL reference C++
coder (compiled from /root/reference/cbench/csrc/ans and driven by
tests/golden/generate_reference_golden.py — artifacts committed as
ref_golden.npz).

This replaces the round-1 self-written spec simulator as the ground truth
for the "bit-exact with the reference" claim.
"""

import os

import numpy as np
import pytest

from cbench_basic_tpu.coding.rans import (
    Rans64Decoder,
    Rans64Encoder,
    pmf_to_quantized_cdf,
)
from cbench_basic_tpu.coding.tans import TansDecoder, TansEncoder
from cbench_basic_tpu.coding.ar_utils import create_ar_offsets

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ref_golden.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), "run tests/golden/generate_reference_golden.py"
    return np.load(GOLDEN)


def test_rans_plain_bypass_bitexact(golden):
    enc = Rans64Encoder(bypass_coding=True)
    enc.init_params(golden["c1_freqs"], golden["c1_nfreqs"], golden["c1_offsets"])
    stream = enc.encode_with_indexes(golden["c1_data"], golden["c1_indexes"])
    assert stream == golden["c1_stream"].tobytes()

    dec = Rans64Decoder(bypass_coding=True)
    dec.init_params(golden["c1_freqs"], golden["c1_nfreqs"], golden["c1_offsets"])
    out = dec.decode_with_indexes(stream, golden["c1_indexes"])
    np.testing.assert_array_equal(out, golden["c1_data"])


def test_rans_nobypass_offsets_bitexact(golden):
    enc = Rans64Encoder(bypass_coding=False)
    enc.init_params(golden["c2_freqs"], golden["c2_nfreqs"], golden["c2_offsets"])
    stream = enc.encode_with_indexes(golden["c2_data"], golden["c2_indexes"])
    assert stream == golden["c2_stream"].tobytes()


def test_rans_ar_table_bitexact(golden):
    ar_offsets = create_ar_offsets(golden["c3_indexes"].shape,
                                   [[0, -1, 0], [0, 0, -1]])
    np.testing.assert_array_equal(ar_offsets, golden["c3_ar_offsets"])

    enc = Rans64Encoder(bypass_coding=False)
    enc.init_params(golden["c3_freqs"], golden["c3_nfreqs"], golden["c3_offsets"])
    enc.init_ar_params(golden["c3_table"])
    ar_indexes = np.zeros_like(golden["c3_indexes"])
    stream = enc.encode_with_indexes(
        golden["c3_data"], golden["c3_indexes"],
        ar_indexes=ar_indexes, ar_offsets=ar_offsets)
    assert stream == golden["c3_stream"].tobytes()

    dec = Rans64Decoder(bypass_coding=False)
    dec.init_params(golden["c3_freqs"], golden["c3_nfreqs"], golden["c3_offsets"])
    dec.init_ar_params(golden["c3_table"])
    out = dec.decode_with_indexes(stream, golden["c3_indexes"],
                                  ar_indexes=ar_indexes, ar_offsets=ar_offsets)
    np.testing.assert_array_equal(out, golden["c3_data"])


def test_pmf_to_quantized_cdf_matches_reference(golden):
    pmfs = golden["c4_pmfs"]
    sizes = golden["c4_sizes"]
    for i, pmf in enumerate(pmfs):
        ours = pmf_to_quantized_cdf(list(pmf) + [1e-8], 16)
        assert len(ours) == sizes[i]
        np.testing.assert_array_equal(
            np.asarray(ours), golden["c4_cdfs"][i, :sizes[i]])


def test_rans_cdf_init_bitexact(golden):
    num_dists = golden["c4_cdfs"].shape[0]
    enc = Rans64Encoder(bypass_coding=True)
    enc.init_cdf_params(golden["c4_cdfs"], golden["c4_sizes"],
                        np.zeros(num_dists, np.int64))
    stream = enc.encode_with_indexes(golden["c4_data"], golden["c4_indexes"])
    assert stream == golden["c4_stream"].tobytes()


def test_rans_streaming_decode_matches_golden(golden):
    """set_stream/decode_stream over the case-1 stream in two chunks must
    reproduce the same symbols (the topogroup group-by-group decode path)."""
    dec = Rans64Decoder(bypass_coding=True)
    dec.init_params(golden["c1_freqs"], golden["c1_nfreqs"], golden["c1_offsets"])
    idx = golden["c1_indexes"].reshape(-1)
    n = idx.size // 2
    dec.set_stream(golden["c1_stream"].tobytes())
    first = dec.decode_stream(idx[:n])
    second = dec.decode_stream(idx[n:])
    np.testing.assert_array_equal(
        np.concatenate([first.ravel(), second.ravel()]),
        golden["c1_data"].reshape(-1))


def test_tans_bitexact(golden):
    num_symbols = golden["c6_freqs"].shape[1]
    enc = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    enc.init_params(golden["c6_freqs"], golden["c6_nfreqs"], golden["c6_offsets"])
    stream = enc.encode_with_indexes(golden["c6_data"], golden["c6_indexes"])
    assert stream == golden["c6_stream"].tobytes()

    dec = TansDecoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    dec.init_params(golden["c6_freqs"], golden["c6_nfreqs"], golden["c6_offsets"])
    out = dec.decode_with_indexes(stream, golden["c6_indexes"])
    np.testing.assert_array_equal(out, golden["c6_data"])


def test_tans_ar_table_bitexact(golden):
    """Case 7: tANS with a 4D in-loop AR lookup table (reference
    tests/ans_test.py:138-170)."""
    num_symbols = golden["c7_freqs"].shape[1]
    idx = golden["c7_indexes"]
    ar_idx = np.zeros_like(idx)
    enc = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=False)
    enc.init_params(golden["c7_freqs"], golden["c7_nfreqs"],
                    golden["c7_offsets"])
    enc.init_ar_params(golden["c7_table"])
    stream = enc.encode_with_indexes(
        golden["c7_data"], idx, ar_indexes=ar_idx,
        ar_offsets=golden["c7_ar_offsets"])
    assert stream == golden["c7_stream"].tobytes()

    dec = TansDecoder(max_symbol_value=num_symbols - 1, bypass_coding=False)
    dec.init_params(golden["c7_freqs"], golden["c7_nfreqs"],
                    golden["c7_offsets"])
    dec.init_ar_params(golden["c7_table"])
    out = dec.decode_with_indexes(stream, idx, ar_indexes=ar_idx,
                                  ar_offsets=golden["c7_ar_offsets"])
    np.testing.assert_array_equal(out, golden["c7_data"])


def test_rans_custom_linear_ar_op_bitexact(golden):
    """Case 8: rANS with ar_limited_scaled_add_linear_op custom ops
    (reference csrc/ans/ans_interface.hpp:39-105, ar_funcs.hpp:57-92)."""
    scale = float(golden["c8_op_scale"])
    hi = float(golden["c8_op_max"])
    ops = [(golden["c8_op_weights"][i].tolist(),
            float(golden["c8_op_bias"][i]), scale, 0.0, hi)
           for i in range(len(golden["c8_op_weights"]))]

    enc = Rans64Encoder(bypass_coding=False)
    enc.init_params(golden["c8_freqs"], golden["c8_nfreqs"],
                    golden["c8_offsets"])
    enc.init_custom_ar_ops(ops)
    stream = enc.encode_with_indexes(
        golden["c8_data"], golden["c8_indexes"],
        ar_indexes=golden["c8_ar_indexes"],
        ar_offsets=golden["c8_ar_offsets"])
    assert stream == golden["c8_stream"].tobytes()

    dec = Rans64Decoder(bypass_coding=False)
    dec.init_params(golden["c8_freqs"], golden["c8_nfreqs"],
                    golden["c8_offsets"])
    dec.init_custom_ar_ops(ops)
    out = dec.decode_with_indexes(
        stream, golden["c8_indexes"],
        ar_indexes=golden["c8_ar_indexes"],
        ar_offsets=golden["c8_ar_offsets"])
    np.testing.assert_array_equal(out, golden["c8_data"])


def test_tans_streaming_decode_matches_golden(golden):
    """Case 9: TansDecoder.set_stream/decode_stream over the case-6 stream
    in two chunks reproduces the symbols (round-2 VERDICT golden gap)."""
    num_symbols = golden["c6_freqs"].shape[1]
    dec = TansDecoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    dec.init_params(golden["c6_freqs"], golden["c6_nfreqs"],
                    golden["c6_offsets"])
    idx = golden["c6_indexes"].reshape(-1)
    n = idx.size // 2
    dec.set_stream(golden["c6_stream"].tobytes())
    first = dec.decode_stream(idx[:n])
    second = dec.decode_stream(idx[n:])
    np.testing.assert_array_equal(
        np.concatenate([first.ravel(), second.ravel()]),
        golden["c6_data"].reshape(-1))


def test_buffered_rans_flush_bitexact(golden):
    """Case 10: the CompressAI-style BufferedRansEncoder two-chunk flush
    (legacy cbench.rans, csrc/rans/rans_interface.cpp:107-238) — the repo's
    Buffered pair reproduces the single-stream flush byte-for-byte and
    decodes the reference stream chunk-by-chunk."""
    from cbench_basic_tpu.codecs.entropy_codecs import (
        BufferedRansDecoder,
        BufferedRansEncoder,
    )

    t1 = (golden["c10_cdfs1"], golden["c10_sizes1"], golden["c10_offsets1"])
    t2 = (golden["c10_cdfs2"], golden["c10_sizes2"], golden["c10_offsets2"])
    enc = BufferedRansEncoder()
    enc.encode_with_indexes_np(golden["c10_data1"], golden["c10_indexes1"], *t1)
    enc.encode_with_indexes_np(golden["c10_data2"], golden["c10_indexes2"], *t2)
    assert enc.flush() == golden["c10_stream"].tobytes()

    dec = BufferedRansDecoder(golden["c10_stream"].tobytes())
    np.testing.assert_array_equal(
        dec.decode_next(golden["c10_indexes1"], *t1), golden["c10_data1"])
    np.testing.assert_array_equal(
        dec.decode_next(golden["c10_indexes2"], *t2), golden["c10_data2"])
