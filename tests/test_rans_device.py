"""Interleaved-lane rANS: C++ encoder vs host reference decoder vs the
on-device (jnp) vectorized decoder — all must agree exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.coding.rans import (
    InterleavedRansEncoder,
    pack_lane_words,
    unpack_lane_words,
)
from cbench_basic_tpu.ops.rans_device import (
    build_decoder_tables,
    decode_flat,
    decode_step,
    init_lane_states,
)


def _tables(rng, num_dists, num_symbols):
    freqs = rng.integers(1, 1024, (num_dists, num_symbols)).astype(np.int32)
    nfreqs = np.full(num_dists, num_symbols, np.int32)
    offsets = np.full(num_dists, -(num_symbols // 2), np.int32)
    return freqs, nfreqs, offsets


def test_interleaved_host_roundtrip():
    rng = np.random.default_rng(0)
    num_dists, num_symbols = 8, 64
    freqs, nfreqs, offsets = _tables(rng, num_dists, num_symbols)
    enc = InterleavedRansEncoder()
    enc.init_params(freqs, nfreqs, offsets)

    n, L = 10000, 64
    data = rng.integers(-32, 31, n).astype(np.int32)
    indexes = rng.integers(0, num_dists, n).astype(np.int32)
    lane_words, counts = enc.encode(data, indexes, L)
    out = enc.decode_host(lane_words, indexes)
    np.testing.assert_array_equal(out, data)

    # Serialization round trip.
    words2, counts2 = unpack_lane_words(pack_lane_words(lane_words, counts))
    np.testing.assert_array_equal(words2, lane_words)
    out2 = enc.decode_host(words2, indexes)
    np.testing.assert_array_equal(out2, data)


def test_interleaved_device_decode_matches():
    rng = np.random.default_rng(1)
    num_dists, num_symbols = 6, 32
    freqs, nfreqs, offsets = _tables(rng, num_dists, num_symbols)
    enc = InterleavedRansEncoder()
    enc.init_params(freqs, nfreqs, offsets)
    cdfs = enc.get_cdfs()
    sizes = np.full(num_dists, num_symbols + 2, np.int32)

    tables = build_decoder_tables(cdfs, sizes, offsets)

    for n, L in ((4096, 64), (5000, 128), (77, 16)):
        data = rng.integers(-16, 15, n).astype(np.int32)
        indexes = rng.integers(0, num_dists, n).astype(np.int32)
        lane_words, _ = enc.encode(data, indexes, L)

        pad = (-n) % L
        idx_pad = np.concatenate([indexes, np.zeros(pad, np.int32)])
        out = jax.jit(decode_flat, static_argnames=("n",))(
            jnp.asarray(lane_words), jnp.asarray(idx_pad), n, tables)
        np.testing.assert_array_equal(np.asarray(out)[:n], data)


def test_interleaved_out_of_range_raises():
    rng = np.random.default_rng(2)
    freqs, nfreqs, offsets = _tables(rng, 2, 8)
    enc = InterleavedRansEncoder()
    enc.init_params(freqs, nfreqs, offsets)
    bad = np.array([1000], np.int32)
    idx = np.zeros(1, np.int32)
    try:
        enc.encode(bad, idx, 4)
        assert False, "expected ValueError"
    except ValueError:
        pass
