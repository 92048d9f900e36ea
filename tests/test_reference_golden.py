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
