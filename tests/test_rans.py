"""rANS64 coder tests.

Coverage mirrors reference tests/ans_test.py (round-trip with bypass, AR
tables, CDF init) plus streaming decode, cache/flush grouped encode, custom
AR linear ops, and a deterministic golden-stream regression.
"""

import numpy as np
import pytest

from cbench_basic_tpu.coding import (
    Rans64Decoder,
    Rans64Encoder,
    create_ar_offsets,
    pmf_to_quantized_cdf,
)


def _params(rng, num_dists, num_symbols):
    freqs = rng.integers(1, 1024, (num_dists, num_symbols)).astype(np.int32)
    nfreqs = np.full(num_dists, num_symbols, dtype=np.int32)
    offsets = np.zeros(num_dists, dtype=np.int32)
    return freqs, nfreqs, offsets


def test_pmf_to_quantized_cdf_properties():
    rng = np.random.default_rng(0)
    for n in (2, 5, 64, 300):
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        diffs = np.diff(cdf)
        assert (diffs >= 1).all()


def test_rans64_roundtrip_with_bypass():
    rng = np.random.default_rng(1)
    num_dists, num_symbols, bypass_num = 8, 64, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    shape = (4, 3, 32, 32)
    data = rng.integers(0, num_symbols + bypass_num, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)

    stream = enc.encode_with_indexes(data, indexes)
    out = dec.decode_with_indexes(stream, indexes)
    np.testing.assert_array_equal(data, out)


def test_rans64_roundtrip_negative_symbols():
    rng = np.random.default_rng(7)
    num_dists, num_symbols = 4, 16
    freqs, nfreqs, _ = _params(rng, num_dists, num_symbols)
    offsets = np.full(num_dists, -8, dtype=np.int32)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    shape = (2, 8, 8)
    data = rng.integers(-40, 40, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)
    out = dec.decode_with_indexes(enc.encode_with_indexes(data, indexes), indexes)
    np.testing.assert_array_equal(data, out)


def test_rans64_ar_roundtrip():
    rng = np.random.default_rng(2)
    num_dists, num_symbols = 8, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    ar_dim_offsets = [[0, -1, 0], [0, 0, -1]]
    ar_table = rng.integers(
        0, num_dists,
        [1, num_dists] + [num_symbols + 1] * len(ar_dim_offsets)).astype(np.int32)

    enc = Rans64Encoder(bypass_coding=False)
    dec = Rans64Decoder(bypass_coding=False)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)
    enc.init_ar_params(ar_table, [ar_dim_offsets])
    dec.init_ar_params(ar_table, [ar_dim_offsets])

    shape = (4, 3, 16, 16)
    data = rng.integers(0, num_symbols, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)
    ar_offsets = create_ar_offsets(shape, ar_dim_offsets)
    ar_indexes = np.zeros(shape, dtype=np.int32)

    stream = enc.encode_with_indexes(data, indexes, ar_indexes=ar_indexes,
                                     ar_offsets=ar_offsets)
    out = dec.decode_with_indexes(stream, indexes, ar_indexes=ar_indexes,
                                  ar_offsets=ar_offsets)
    np.testing.assert_array_equal(data, out)


def test_rans64_cdf_init_roundtrip():
    rng = np.random.default_rng(3)
    num_dists, num_symbols, bypass_num = 8, 64, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)

    pmfs = freqs.astype(np.float32) / freqs.sum(axis=1, keepdims=True)
    cdfs = [pmf_to_quantized_cdf(list(p) + [1e-8], 16) for p in pmfs]
    cdf_sizes = np.array([len(c) for c in cdfs], dtype=np.int32)
    cdfs_np = np.zeros((num_dists, cdf_sizes.max()), dtype=np.int32)
    for i, c in enumerate(cdfs):
        cdfs_np[i, :len(c)] = c

    enc.init_cdf_params(cdfs_np, cdf_sizes, offsets)
    dec.init_cdf_params(cdfs_np, cdf_sizes, offsets)

    shape = (4, 3, 16, 16)
    data = rng.integers(0, num_symbols + bypass_num, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)
    out = dec.decode_with_indexes(enc.encode_with_indexes(data, indexes), indexes)
    np.testing.assert_array_equal(data, out)


def test_rans64_streaming_decode_matches_full():
    """Group-by-group decode_stream must reproduce the full decode — this is
    the topogroup decode path (groups decoded incrementally from one stream)."""
    rng = np.random.default_rng(4)
    num_dists, num_symbols = 6, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    n = 5000
    data = rng.integers(0, num_symbols, n).astype(np.int32)
    indexes = rng.integers(0, num_dists, n).astype(np.int32)
    stream = enc.encode_with_indexes(data, indexes)

    dec.set_stream(stream)
    pieces = []
    start = 0
    for size in (1, 10, 489, 1500, 3000):
        pieces.append(dec.decode_stream(indexes[start:start + size]))
        start += size
    out = np.concatenate(pieces)
    np.testing.assert_array_equal(data, out)


def test_rans64_cache_flush_groups():
    """cache=True accumulates groups; flush() emits one stream. Reference
    semantics (rans64.cpp:363-386): flush iterates cached symbols forward, so
    groups come out of the stream in REVERSE caching order (LIFO)."""
    rng = np.random.default_rng(5)
    num_dists, num_symbols = 6, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    groups = []
    for size in (100, 37, 1000):
        data = rng.integers(0, num_symbols + 8, size).astype(np.int32)
        indexes = rng.integers(0, num_dists, size).astype(np.int32)
        groups.append((data, indexes))
        enc.encode_with_indexes(data, indexes, cache=True)

    stream = enc.flush()
    rev = groups[::-1]
    all_data = np.concatenate([g[0] for g in rev])
    all_idx = np.concatenate([g[1] for g in rev])
    out = dec.decode_with_indexes(stream, all_idx)
    np.testing.assert_array_equal(all_data, out)

    # And incrementally (LIFO group order):
    dec.set_stream(stream)
    for data, indexes in rev:
        np.testing.assert_array_equal(data, dec.decode_stream(indexes))


def test_rans64_cache_equals_direct_encode():
    """Single-shot cache+flush must produce the identical bitstream to a
    direct encode (same symbol order, same state evolution)."""
    rng = np.random.default_rng(6)
    num_dists, num_symbols = 4, 16
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)
    enc1 = Rans64Encoder(bypass_coding=True)
    enc2 = Rans64Encoder(bypass_coding=True)
    enc1.init_params(freqs, nfreqs, offsets)
    enc2.init_params(freqs, nfreqs, offsets)

    data = rng.integers(0, num_symbols + 20, 500).astype(np.int32)
    indexes = rng.integers(0, num_dists, 500).astype(np.int32)
    direct = enc1.encode_with_indexes(data, indexes)
    enc2.encode_with_indexes(data, indexes, cache=True)
    assert enc2.flush() == direct


def test_rans64_custom_ar_ops_roundtrip():
    rng = np.random.default_rng(8)
    num_dists, num_symbols = 16, 32
    freqs, nfreqs, offsets = _params(rng, num_dists, num_symbols)

    enc = Rans64Encoder(bypass_coding=False)
    dec = Rans64Decoder(bypass_coding=False)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    # One op: index' = clamped scaled-add of the left-neighbor symbol.
    ops = [([0.1], 0.0, 1.0, 0.0, float(num_dists - 1))]
    enc.init_custom_ar_ops(ops)
    dec.init_custom_ar_ops(ops)

    shape = (2, 1, 8, 8)
    data = rng.integers(0, num_symbols, shape).astype(np.int32)
    indexes = rng.integers(0, num_dists, shape).astype(np.int32)
    ar_offsets = create_ar_offsets(shape, [[0, 0, -1]])
    ar_indexes = np.zeros(shape, dtype=np.int32)
    stream = enc.encode_with_indexes(data, indexes, ar_indexes=ar_indexes,
                                     ar_offsets=ar_offsets)
    out = dec.decode_with_indexes(stream, indexes, ar_indexes=ar_indexes,
                                  ar_offsets=ar_offsets)
    np.testing.assert_array_equal(data, out)


def test_golden_stream_regression():
    """Deterministic bitstream fingerprint — guards bit-exactness across
    refactors of the native coder."""
    num_dists, num_symbols = 2, 8
    freqs = np.array([[10, 20, 30, 40, 50, 60, 70, 80],
                      [80, 70, 60, 50, 40, 30, 20, 10]], dtype=np.int32)
    nfreqs = np.array([8, 8], dtype=np.int32)
    offsets = np.array([0, 0], dtype=np.int32)
    enc = Rans64Encoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    data = np.arange(16, dtype=np.int32).reshape(1, 16) % 12
    indexes = (np.arange(16, dtype=np.int32) % num_dists).reshape(1, 16)
    stream = enc.encode_with_indexes(data, indexes)
    import hashlib
    digest = hashlib.sha256(stream).hexdigest()
    dec = Rans64Decoder(bypass_coding=True)
    dec.init_params(freqs, nfreqs, offsets)
    np.testing.assert_array_equal(dec.decode_with_indexes(stream, indexes), data)
    # Fingerprint pinned at first build; any change means a bitstream break.
    assert digest == GOLDEN_DIGEST, f"bitstream changed: {digest}"


# Pinned by the first verified build (see test above).
GOLDEN_DIGEST = "ea1f286ef674220563f4826fcc8a1ba26ecf51845685dbfc13dee1c44c26a64f"
