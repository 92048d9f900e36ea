"""tANS (FSE-style) coder tests — mirrors reference tests/ans_test.py tANS
cases plus streaming decode and cache/flush."""

import numpy as np
import pytest

from cbench_basic_tpu.coding import create_ar_offsets
from cbench_basic_tpu.coding.tans import TansDecoder, TansEncoder


def _params(rng, num_dists, num_symbols):
    freqs = rng.integers(1, 1024, (num_dists, num_symbols)).astype(np.int32)
    nfreqs = np.full(num_dists, num_symbols, dtype=np.int32)
    offsets = np.zeros(num_dists, dtype=np.int32)
    return freqs, nfreqs, offsets


def test_tans_roundtrip_with_bypass():
    rng = np.random.default_rng(0)
    num_dists, num_symbols, bypass_num = 8, 64, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    enc = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    dec = TansDecoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    shape = (4, 3, 32, 32)
    data = rng.integers(0, num_symbols + bypass_num, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)
    stream = enc.encode_with_indexes(data, indexes)
    out = dec.decode_with_indexes(stream, indexes)
    np.testing.assert_array_equal(data, out)
    # Sanity: compressed below the raw 4-bytes/symbol.
    assert len(stream) < data.nbytes


def test_tans_roundtrip_no_bypass_in_range():
    rng = np.random.default_rng(1)
    num_dists, num_symbols = 4, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)
    enc = TansEncoder(max_symbol_value=num_symbols - 1)
    dec = TansDecoder(max_symbol_value=num_symbols - 1)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)
    # In-range values only (max is the sentinel slot).
    data = rng.integers(0, num_symbols - 1, 5000).astype(np.int32)
    indexes = rng.integers(0, num_dists, 5000).astype(np.int32)
    out = dec.decode_with_indexes(enc.encode_with_indexes(data, indexes), indexes)
    np.testing.assert_array_equal(data, out)


def test_tans_ar_roundtrip():
    rng = np.random.default_rng(2)
    num_dists, num_symbols = 8, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    ar_dim_offsets = [[0, -1, 0], [0, 0, -1]]
    ar_table = rng.integers(
        0, num_dists,
        [1, num_dists] + [num_symbols + 1] * 2).astype(np.int32)

    enc = TansEncoder(max_symbol_value=num_symbols - 1)
    dec = TansDecoder(max_symbol_value=num_symbols - 1)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)
    enc.init_ar_params(ar_table, [ar_dim_offsets])
    dec.init_ar_params(ar_table, [ar_dim_offsets])

    shape = (4, 3, 16, 16)
    data = rng.integers(0, num_symbols - 1, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)
    ar_offsets = create_ar_offsets(shape, ar_dim_offsets)
    ar_indexes = np.zeros(shape, dtype=np.int32)
    stream = enc.encode_with_indexes(data, indexes, ar_indexes=ar_indexes,
                                     ar_offsets=ar_offsets)
    out = dec.decode_with_indexes(stream, indexes, ar_indexes=ar_indexes,
                                  ar_offsets=ar_offsets)
    np.testing.assert_array_equal(data, out)


def test_tans_streaming_decode():
    rng = np.random.default_rng(3)
    num_dists, num_symbols = 4, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)
    enc = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    dec = TansDecoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    n = 3000
    data = rng.integers(0, num_symbols + 8, n).astype(np.int32)
    indexes = rng.integers(0, num_dists, n).astype(np.int32)
    stream = enc.encode_with_indexes(data, indexes)
    dec.set_stream(stream)
    pieces, start = [], 0
    for size in (1, 99, 900, 2000):
        pieces.append(dec.decode_stream(indexes[start:start + size]))
        start += size
    np.testing.assert_array_equal(np.concatenate(pieces), data)


def test_tans_cache_flush_matches_direct():
    rng = np.random.default_rng(4)
    num_dists, num_symbols = 4, 16
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)
    enc1 = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    enc2 = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    enc1.init_params(freqs, nfreqs, offsets)
    enc2.init_params(freqs, nfreqs, offsets)
    data = rng.integers(0, num_symbols + 20, 500).astype(np.int32)
    indexes = rng.integers(0, num_dists, 500).astype(np.int32)
    direct = enc1.encode_with_indexes(data, indexes)
    enc2.encode_with_indexes(data, indexes, cache=True)
    assert enc2.flush() == direct
