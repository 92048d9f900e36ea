"""Bitstream spec cross-check.

A deliberately literal, slow Python simulator of the reference bitstream
semantics (rans64.h / rans64.cpp contract: division-form encode, 2-word
flush, forward decode, bypass escapes, tail-mass CDF quantization with
frequency stealing). The native coder's optimized paths (fixed-point
reciprocal encode, cum2sym decode) must produce byte-identical streams.
"""

import numpy as np

from cbench_basic_tpu.coding import Rans64Decoder, Rans64Encoder, pmf_to_quantized_cdf

L = 1 << 31
MASK32 = 0xFFFFFFFF


def spec_pmf_to_quantized_cdf(pmf, precision):
    cdf = [0] + [int(np.float32(np.round(np.float32(p) * np.float32(1 << precision))))
                 for p in pmf]
    total = sum(cdf)
    cdf = [((1 << precision) * p) // total for p in cdf]
    out = np.cumsum(cdf).tolist()
    out[-1] = 1 << precision
    n = len(out) - 1
    for i in range(n):
        if out[i] == out[i + 1]:
            best, best_freq = -1, 1 << 62
            for j in range(n):
                f = out[j + 1] - out[j]
                if 1 < f < best_freq:
                    best_freq, best = f, j
            assert best >= 0
            if best < i:
                for j in range(best + 1, i + 1):
                    out[j] -= 1
            else:
                for j in range(i + 1, best + 1):
                    out[j] += 1
    return out


class SpecEncoder:
    """Division-form rANS64 encoder, bypass-capable."""

    def __init__(self, cdfs, sizes, offsets, precision=16, bypass=True, bp=4):
        self.cdfs, self.sizes, self.offsets = cdfs, sizes, offsets
        self.precision, self.bypass, self.bp = precision, bypass, bp
        self.max_bp = (1 << bp) - 1

    def _put(self, state, words, start, freq):
        x_max = ((L >> self.precision) << 32) * freq
        if state >= x_max:
            words.append(state & MASK32)
            state >>= 32
        return ((state // freq) << self.precision) + (state % freq) + start

    def _put_bits(self, state, words, val, nbits):
        freq = 1 << (16 - nbits)
        x_max = ((L >> 16) << 32) * freq
        if state >= x_max:
            words.append(state & MASK32)
            state >>= 32
        return (state << nbits) | val

    def encode(self, symbols, indexes):
        state = L
        words = []  # emitted back-to-front; reversed at the end
        for i in range(len(symbols) - 1, -1, -1):
            d = indexes[i]
            cdf = self.cdfs[d]
            max_value = self.sizes[d] - 2
            value = symbols[i] - self.offsets[d]
            raw = 0
            if self.bypass:
                if value < 0:
                    raw, value = -2 * value - 1, max_value
                elif value >= max_value:
                    raw, value = 2 * (value - max_value), max_value
                if value == max_value:
                    nb = 0
                    while (raw >> (nb * self.bp)) != 0:
                        nb += 1
                    seq = []
                    v = nb
                    while v >= self.max_bp:
                        seq.append(self.max_bp)
                        v -= self.max_bp
                    seq.append(v)
                    for j in range(nb):
                        seq.append((raw >> (j * self.bp)) & self.max_bp)
                    for s in reversed(seq):
                        state = self._put_bits(state, words, s, self.bp)
            state = self._put(state, words, cdf[value], cdf[value + 1] - cdf[value])
        # Flush: stream head is (lo, hi); the backward buffer reverses append
        # order, so append hi then lo.
        words.append((state >> 32) & MASK32)
        words.append(state & MASK32)
        return np.array(words[::-1], dtype=np.uint32).tobytes()


def _make_tables(rng, num_dists, num_symbols, precision=16):
    freqs = rng.integers(1, 64, (num_dists, num_symbols)).astype(np.int32)
    cdfs, sizes = [], []
    for d in range(num_dists):
        total = np.float32(0)
        for f in freqs[d]:
            total = np.float32(total + np.float32(f))
        total = np.float32(total + np.float32(1.0))
        pmf = [np.float32(f) / total for f in freqs[d]] + [np.float32(1.0) / total]
        cdfs.append(spec_pmf_to_quantized_cdf(pmf, precision))
        sizes.append(num_symbols + 2)
    return freqs, cdfs, sizes


def test_native_stream_matches_spec():
    rng = np.random.default_rng(42)
    num_dists, num_symbols = 4, 12
    freqs, cdfs, sizes = _make_tables(rng, num_dists, num_symbols)
    offsets = [0] * num_dists

    enc = Rans64Encoder(bypass_coding=True)
    enc.init_params(freqs, np.full(num_dists, num_symbols), np.zeros(num_dists))

    # Native CDF quantization must equal the spec's.
    native_cdfs = enc.get_cdfs()
    for d in range(num_dists):
        assert native_cdfs[d, :sizes[d]].tolist() == cdfs[d]

    spec = SpecEncoder(cdfs, sizes, offsets)
    for trial in range(5):
        n = int(rng.integers(1, 400))
        symbols = rng.integers(-5, num_symbols + 30, n).astype(np.int32)
        indexes = rng.integers(0, num_dists, n).astype(np.int32)
        expect = spec.encode(symbols.tolist(), indexes.tolist())
        got = enc.encode_with_indexes(symbols, indexes)
        assert got == expect, f"trial {trial}: stream mismatch"

    # And the native decoder round-trips the spec's stream.
    dec = Rans64Decoder(bypass_coding=True)
    dec.init_params(freqs, np.full(num_dists, num_symbols), np.zeros(num_dists))
    symbols = rng.integers(-5, num_symbols + 30, 200).astype(np.int32)
    indexes = rng.integers(0, num_dists, 200).astype(np.int32)
    stream = spec.encode(symbols.tolist(), indexes.tolist())
    np.testing.assert_array_equal(dec.decode_with_indexes(stream, indexes), symbols)


def test_quantize_pmf_matches_spec():
    rng = np.random.default_rng(9)
    for n in (3, 17, 100):
        p = rng.random(n).astype(np.float32)
        p /= p.sum()
        assert pmf_to_quantized_cdf(p, 16) == spec_pmf_to_quantized_cdf(
            [np.float32(x) for x in p], 16)
