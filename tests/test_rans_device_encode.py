"""On-device interleaved rans32 ENCODE (ops/rans_device.encode_flat32).

The encoder must be byte-identical to the host C++ rans32 encoder
(coding/csrc/anscoder.cpp rans32_encode_interleaved) so that every
existing decoder — host reference or fused device — reads its streams
and the pack_lane_words container stays one format. These tests pin:
lane-stream byte equality vs the C++ encoder (incl. ragged n and small
lane counts), pack_lane_words payload equality, round-trip through the
device decoder, and the out-of-table-range ok=False contract.
"""
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.coding.rans import (
    InterleavedRans32Encoder,
    pack_lane_words,
)
from cbench_basic_tpu.ops.rans_device import (
    build_decoder_tables,
    decode_flat,
    encode_flat32,
)


def _setup(rng, D=16, S=64):
    freqs = rng.uniform(0.01, 1, (D, S)).astype(np.float32)
    freqs /= freqs.sum(1, keepdims=True)
    offsets = rng.integers(-10, 10, D).astype(np.int32)
    nfreqs = np.full(D, S, np.int32)
    enc = InterleavedRans32Encoder()
    enc.init_params(freqs, nfreqs, offsets)
    tables = build_decoder_tables(enc.get_cdfs(), np.full(D, S + 1, np.int32),
                                  offsets)
    return enc, tables, offsets, D, S


def _device_encode(sym, idx, n, tables, L):
    pad = (-n) % L
    sym_p = np.concatenate([sym, np.zeros(pad, np.int32)])
    idx_p = np.concatenate([idx, np.zeros(pad, np.int32)])
    body, counts, total, ok = encode_flat32(
        jnp.asarray(sym_p), jnp.asarray(idx_p), n, tables, L)
    return (np.asarray(body), np.asarray(counts), int(total), bool(ok))


def test_device_encode_bytes_match_host():
    rng = np.random.default_rng(10)
    enc, tables, offsets, D, S = _setup(rng)
    for n, L in ((100003, 512), (4096, 128), (777, 8), (50000, 2048)):
        idx = rng.integers(0, D, n).astype(np.int32)
        sym = rng.integers(0, S, n).astype(np.int32) + offsets[idx]
        lw, lc = enc.encode(sym, idx, L)
        body, counts, total, ok = _device_encode(sym, idx, n, tables, L)
        assert ok
        assert np.array_equal(counts, lc), (n, L)
        assert total == int(lc.sum())
        off = 0
        for l in range(L):
            assert np.array_equal(body[off:off + lc[l]], lw[l, : lc[l]]), \
                (n, L, l)
            off += lc[l]
        # the flat payload is exactly the pack_lane_words marker-1 body
        blob = pack_lane_words(lw, lc)
        assert blob[4 + 2 * L:] == body[:total].tobytes()


def test_device_encode_roundtrips_through_device_decode():
    rng = np.random.default_rng(11)
    enc, tables, offsets, D, S = _setup(rng)
    n, L = 30000, 256
    idx = rng.integers(0, D, n).astype(np.int32)
    sym = rng.integers(0, S, n).astype(np.int32) + offsets[idx]
    body, counts, total, ok = _device_encode(sym, idx, n, tables, L)
    assert ok
    # rebuild the (L, max_words) dense view the device decoder consumes
    mw = int(counts.max())
    lw = np.zeros((L, mw), np.uint16)
    off = 0
    for l in range(L):
        lw[l, : counts[l]] = body[off:off + counts[l]]
        off += counts[l]
    pad = (-n) % L
    idx_p = np.concatenate([idx, np.zeros(pad, np.int32)])
    out = np.asarray(decode_flat(jnp.asarray(lw), jnp.asarray(idx_p), n,
                                 tables))[:n]
    assert np.array_equal(out, sym)


def test_device_encode_out_of_range_flags_not_ok():
    rng = np.random.default_rng(12)
    enc, tables, offsets, D, S = _setup(rng)
    n, L = 1000, 64
    idx = rng.integers(0, D, n).astype(np.int32)
    sym = rng.integers(0, S, n).astype(np.int32) + offsets[idx]
    sym[500] = offsets[idx[500]] + S + 100  # outside the table
    _, _, _, ok = _device_encode(sym, idx, n, tables, L)
    assert not ok
    sym[500] = offsets[idx[500]] - 1  # below the table
    _, _, _, ok = _device_encode(sym, idx, n, tables, L)
    assert not ok
