"""CDF-equalized table-code coding of unbounded non-negative integers.

Parity: the reference's tANS table-code family
(cbench/modules/entropy_coder/tans_utils.py:305-455 generate/transform,
fse.py:81-340 TANSEntropyCoder / TrainablePredCntTANSEntropyCoder): a value
distribution is bucketed into <=256 TABLE CODES so each code carries
roughly equal probability mass ("equalize_cdf"); a value encodes as its
table code (entropy-coded) plus in-bucket residue bits (raw); values past
the table range use power-of-two OVERFLOW codes (zstd's matchLength /
offset coding scheme). The trainable variant accumulates value histograms
over a corpus and rebuilds the table (the reference's predicted-counts
training).

Everything here is host-side numpy + the native coders (byte plumbing, not
a TPU compute path): transforms are fully vectorized (digitize/gather), the
code stream rides the rANS backend with the quantized count table in the
header, and residues pack through the coder's raw-bits bypass path.
"""

from __future__ import annotations

import struct
from typing import Optional, Sequence

import numpy as np

from .base import CodecInterface, SelfTrainableInterface


def _highbits(v):
    """ceil(log2(v+1)): number of bits to represent v (vectorized)."""
    v = np.asarray(v, np.int64)
    out = np.zeros(v.shape, np.int64)
    x = v.copy()
    while np.any(x > 0):
        out = np.where(x > 0, out + 1, out)
        x >>= 1
    return out


def equalize_cdf_table(distribution: np.ndarray,
                       max_symbol: int = 255) -> np.ndarray:
    """value -> table-code map with ~equal probability mass per code
    (reference _equalize_cdf, tans_utils.py:10-46)."""
    pdf = np.asarray(distribution, np.float64)
    pdf = pdf / max(pdf.sum(), 1e-12)
    cdf = np.cumsum(np.concatenate([[0.0], pdf]))[:-1]
    # cap the code count so no code exceeds one bucket of the largest mass
    k = min(max_symbol, int(np.ceil(1.0 / max(pdf.max(), 1e-12))))
    splits = np.arange(1, k + 1) / (k + 1)
    return np.digitize(cdf, splits).astype(np.int64)


def generate_coding_table(distribution: np.ndarray, max_symbol: int = 255,
                          max_bits: int = 31):
    """Returns (coding_table, extra_symbols): coding_table maps in-range
    values to codes; extra_symbols[c] = bucket size of code c (residue
    range). Power-of-two overflow codes append for values >= len(table)
    (reference generate_tans_coding_table, tans_utils.py:305-377)."""
    distribution = np.asarray(distribution, np.float64)
    n = len(distribution)
    overflow_codes = int(_highbits((1 << max_bits) // n))
    coding_table = equalize_cdf_table(distribution,
                                      max_symbol - overflow_codes)
    extra_symbols = np.bincount(coding_table).astype(np.int64)
    start_bits = int(_highbits(n)) - 1
    ov = 1 << np.arange(start_bits, start_bits + overflow_codes, dtype=np.int64)
    if len(ov):
        ov[0] = (1 << (start_bits + 1)) - n
    return coding_table, np.concatenate([extra_symbols, ov])


def values_to_codes(values: np.ndarray, coding_table: np.ndarray):
    """(codes, residues): in-range values use their bucket code + offset
    from the bucket TOP; overflow values use 2^k band codes (reference
    tans_data_to_code, tans_utils.py:378-411)."""
    values = np.asarray(values, np.int64)
    if np.any(values < 0):
        raise ValueError("table-code values must be non-negative")
    n = len(coding_table)
    top = np.zeros(int(coding_table.max()) + 1, np.int64)
    top[coding_table] = np.arange(n)          # last value of each bucket
    clip = np.minimum(values, n - 1)
    base_code = coding_table[clip]
    base_res = top[base_code] - values
    ov_code = int(coding_table.max()) + 1 \
        + np.maximum(_highbits(values) - _highbits(np.int64(n)), 0)
    ov_res = (1 << _highbits(values)) - 1 - values
    in_range = values < n
    return (np.where(in_range, base_code, ov_code).astype(np.int32),
            np.where(in_range, base_res, ov_res).astype(np.int64))


def codes_to_values(codes: np.ndarray, residues: np.ndarray,
                    coding_table: np.ndarray):
    """Inverse of values_to_codes (reference tans_code_to_data)."""
    codes = np.asarray(codes, np.int64)
    residues = np.asarray(residues, np.int64)
    n = len(coding_table)
    top = np.zeros(int(coding_table.max()) + 1, np.int64)
    top[coding_table] = np.arange(n)
    maxcode = int(coding_table.max())
    band = np.maximum(codes - maxcode, 0)
    ov_top = (np.int64(1) << (band + int(_highbits(np.int64(n))) - 1)) - 1
    base_top = top[np.minimum(codes, maxcode)]
    return np.where(band == 0, base_top, ov_top) - residues


def _pack_residues(residues: np.ndarray, nbits: np.ndarray) -> bytes:
    """LSB-first bit packing of per-element residues at per-element widths."""
    total = int(nbits.sum())
    out = np.zeros((total + 7) // 8, np.uint8)
    pos = 0
    for r, b in zip(residues, nbits):
        for k in range(int(b)):
            if (r >> k) & 1:
                out[(pos + k) >> 3] |= 1 << ((pos + k) & 7)
        pos += int(b)
    return out.tobytes()


def _unpack_residues(data: bytes, nbits: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    out = np.zeros(len(nbits), np.int64)
    pos = 0
    for i, b in enumerate(nbits):
        b = int(b)
        if b:
            chunk = bits[pos:pos + b]
            out[i] = int(np.sum(chunk.astype(np.int64) << np.arange(b)))
            pos += b
    return out


class TableCodeCodec(CodecInterface):
    """Table-code codec: codes rANS-coded under the table's implied prior
    (quantized counts in the header would be redundant — the table is part
    of the codec state, like the reference's predefined counts), residues
    packed as raw bits."""

    MAGIC = b"TC1"

    def __init__(self, distribution: Optional[np.ndarray] = None,
                 coding_table: Optional[np.ndarray] = None,
                 extra_symbols: Optional[np.ndarray] = None,
                 max_symbol: int = 255, max_bits: int = 31):
        code_mass = None
        if coding_table is None:
            if distribution is None:
                # default: pure power-of-two bands (reference fse.py:108-111)
                coding_table = np.zeros(1, np.int64)
                extra_symbols = 1 << np.arange(max_bits + 1, dtype=np.int64)
            else:
                distribution = np.asarray(distribution, np.float64)
                coding_table, extra_symbols = generate_coding_table(
                    distribution, max_symbol, max_bits)
                # entropy prior over CODES = summed value mass per bucket
                # (+ a light tail for the overflow bands)
                mass = np.bincount(coding_table, weights=distribution)
                tail = np.full(len(extra_symbols) - len(mass),
                               max(distribution.sum(), 1.0) * 1e-4)
                code_mass = np.concatenate([np.maximum(mass, 1e-9), tail])
        self.coding_table = np.asarray(coding_table, np.int64)
        self.extra_symbols = np.asarray(extra_symbols, np.int64)
        self.num_codes = len(self.extra_symbols)
        self.code_mass = code_mass
        self._pair = None

    def _residue_bits(self, codes: np.ndarray) -> np.ndarray:
        sizes = self.extra_symbols[codes]
        return np.where(sizes > 1, _highbits(sizes - 1), 0)

    def _coder_pair(self):
        if self._pair is None:
            from ..coding.rans import Rans64Decoder, Rans64Encoder
            # prior over codes = the training distribution's bucket mass
            # (equalized buckets -> near-uniform; the residue bits carry the
            # in-bucket entropy). Uniform fallback without a distribution.
            mass = (self.code_mass if self.code_mass is not None
                    else np.ones(self.num_codes, np.float64))
            freqs = np.maximum(
                np.round(mass / mass.sum() * 65536), 1)[None, :].astype(
                np.int64)
            nf = np.array([self.num_codes], np.int64)
            off = np.zeros(1, np.int64)
            enc = Rans64Encoder(bypass_coding=False)
            dec = Rans64Decoder(bypass_coding=False)
            enc.init_params(freqs, nf, off)
            dec.init_params(freqs, nf, off)
            self._pair = (enc, dec)
        return self._pair

    def compress(self, values) -> bytes:
        values = np.asarray(values).reshape(-1)
        codes, residues = values_to_codes(values, self.coding_table)
        nbits = self._residue_bits(codes)
        enc, _ = self._coder_pair()
        code_stream = enc.encode_with_indexes(
            codes.astype(np.int32), np.zeros(len(codes), np.int32))
        res_stream = _pack_residues(residues, nbits)
        return (self.MAGIC + struct.pack("<II", len(values), len(code_stream))
                + code_stream + res_stream)

    def decompress(self, data: bytes) -> np.ndarray:
        assert data[:3] == self.MAGIC, "bad table-code stream"
        n, clen = struct.unpack_from("<II", data, 3)
        off = 3 + 8
        _, dec = self._coder_pair()
        codes = np.asarray(dec.decode_with_indexes(
            data[off:off + clen], np.zeros(n, np.int32)))
        nbits = self._residue_bits(codes)
        residues = _unpack_residues(data[off + clen:], nbits)
        return codes_to_values(codes, residues, self.coding_table)

    def estimate_bits(self, values) -> float:
        values = np.asarray(values).reshape(-1)
        codes, _ = values_to_codes(values, self.coding_table)
        mass = (self.code_mass if self.code_mass is not None
                else np.ones(self.num_codes, np.float64))
        p = np.maximum(mass, 1e-12) / mass.sum()
        return float(np.sum(-np.log2(p[codes]))
                     + np.sum(self._residue_bits(codes)))


class TrainableTableCodeCodec(TableCodeCodec, SelfTrainableInterface):
    """Trains the bucketing from data histograms (reference
    TrainablePredCntTANSEntropyCoder, fse.py:180-340): train_iter
    accumulates value counts; update_state re-derives the equalized table.
    """

    def __init__(self, value_range: int = 4096, max_symbol: int = 255,
                 max_bits: int = 31):
        self.value_range = value_range
        self.max_symbol = max_symbol
        self.max_bits = max_bits
        self._counts = np.zeros(value_range, np.float64)
        super().__init__(distribution=np.ones(value_range),
                         max_symbol=max_symbol, max_bits=max_bits)

    def train_iter(self, values, *args, **kwargs):
        values = np.asarray(values, np.int64).reshape(-1)
        clipped = np.clip(values, 0, self.value_range - 1)
        np.add.at(self._counts, clipped, 1.0)

    def train_full(self, dataloader, *args, **kwargs):
        for batch in dataloader:
            self.train_iter(batch)
        self.update_state()

    def update_state(self, *args, **kwargs):
        dist = self._counts + 1.0  # +1 smoothing keeps all values codable
        self.coding_table, self.extra_symbols = generate_coding_table(
            dist, self.max_symbol, self.max_bits)
        self.num_codes = len(self.extra_symbols)
        mass = np.bincount(self.coding_table, weights=dist)
        tail = np.full(self.num_codes - len(mass), dist.sum() * 1e-4)
        self.code_mass = np.concatenate([np.maximum(mass, 1e-9), tail])
        self._pair = None

    # SelfTrainableInterface hooks
    def get_parameters(self):
        return {"counts": self._counts.copy()}

    def load_parameters(self, parameters, *args, **kwargs):
        self._counts = np.asarray(parameters["counts"], np.float64)
        self.update_state()
