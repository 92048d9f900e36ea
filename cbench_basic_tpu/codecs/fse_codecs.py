"""FSE/tANS byte + grouped LZ77 sequence codecs.

Parity: reference `cbench/modules/entropy_coder/fse.py` (FSEEntropyCoder /
TANSEntropyCoder) and the zstd-style grouped sequence coding wired by
`configs/codecs/general/entropy_models/grouped_for_lz77_zstd.py` (separate
literal / literal-run-length / match-length / offset substreams, bucket
codes with extra bits, one tANS table per substream — the zstd sequence
scheme). Backed by the native tANS coder (`coding/tans.py`), not a Python
FSE re-implementation.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from ..coding.tans import TansDecoder, TansEncoder
from .base import CodecInterface

_MIN_MATCH = 4  # keep in sync with codecs/lz77.py


def _scale_counts_u16(counts: np.ndarray) -> np.ndarray:
    """Scale raw counts so every entry fits u16, keeping nonzero nonzero.

    Encoder and decoder both init their tANS table from the SCALED counts,
    so any distribution distortion is symmetric and harmless.
    """
    counts = counts.astype(np.int64)
    mx = counts.max() if counts.size else 0
    if mx > 0xFFFF:
        scaled = (counts * 0xFFFF + mx - 1) // mx
        scaled[(counts > 0) & (scaled == 0)] = 1
        counts = scaled
    return counts.astype(np.uint16)


def _tans_code_stream(symbols: np.ndarray, alphabet: int,
                      table_log: int) -> bytes:
    """Self-contained tANS blob: [u16 counts[alphabet]][u32 len][payload]."""
    symbols = np.asarray(symbols, dtype=np.int32)
    counts = np.bincount(symbols, minlength=alphabet) if symbols.size else \
        np.zeros(alphabet, dtype=np.int64)
    counts = _scale_counts_u16(counts)
    header = counts.astype("<u2").tobytes()
    if symbols.size == 0:
        return header + struct.pack("<I", 0)
    enc = TansEncoder(table_log=table_log, max_symbol_value=alphabet - 1)
    enc.init_params(counts[None, :].astype(np.int32),
                    np.array([alphabet]), np.array([0]))
    payload = enc.encode_with_indexes(symbols, np.zeros_like(symbols))
    return header + struct.pack("<I", len(payload)) + payload


def _tans_decode_stream(blob: bytes, pos: int, n: int, alphabet: int,
                        table_log: int) -> Tuple[np.ndarray, int]:
    counts = np.frombuffer(blob[pos:pos + 2 * alphabet], dtype="<u2")
    pos += 2 * alphabet
    (plen,) = struct.unpack_from("<I", blob, pos)
    pos += 4
    payload = blob[pos:pos + plen]
    pos += plen
    if n == 0:
        return np.zeros(0, dtype=np.int32), pos
    dec = TansDecoder(table_log=table_log, max_symbol_value=alphabet - 1)
    dec.init_params(counts[None, :].astype(np.int32),
                    np.array([alphabet]), np.array([0]))
    out = dec.decode_with_indexes(payload, np.zeros(n, dtype=np.int32))
    return out, pos


class TansByteCodec(CodecInterface):
    """FSEEntropyCoder parity: one tANS table over the byte alphabet."""

    def __init__(self, table_log: int = 11):
        self.table_log = table_log

    def compress(self, data) -> bytes:
        raw = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data, np.uint8).tobytes()
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
        return struct.pack("<I", arr.size) + \
            _tans_code_stream(arr, 256, self.table_log)

    def decompress(self, data: bytes) -> bytes:
        (n,) = struct.unpack_from("<I", data, 0)
        out, _ = _tans_decode_stream(data, 4, n, 256, self.table_log)
        return out.astype(np.uint8).tobytes()


class _BitWriter:
    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        self._acc |= (value & ((1 << nbits) - 1)) << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def bytes(self) -> bytes:
        out = bytearray(self._out)
        if self._nbits:
            out.append(self._acc & 0xFF)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self._nbits < nbits:
            self._acc |= self._data[self._pos] << self._nbits
            self._pos += 1
            self._nbits += 8
        v = self._acc & ((1 << nbits) - 1)
        self._acc >>= nbits
        self._nbits -= nbits
        return v


def _bucket(v: int) -> Tuple[int, int, int]:
    """zstd-style code: (highbit, extra_bits_count, extra_bits_value)."""
    if v <= 0:
        return 0, 0, 0
    b = v.bit_length() - 1
    return b + 1, b, v - (1 << b)


_SEQ_ALPHABET = 33  # bucket 0 (value 0) + highbit up to 31


class GroupedLZ77EntropyCodec(CodecInterface):
    """zstd-style grouped sequence coding of an LZ77 token stream.

    Parses the `codecs/lz77.py` token format into zstd sequences
    (literal-run length, match length, offset), codes literals with one
    tANS table, match lengths with another, and the run-length / offset
    BUCKET codes with two more, packing the bucket extra bits into a raw
    bitstream — the exact decomposition zstd's sequence entropy stage uses
    and the reference's grouped_for_lz77_zstd config expresses with its
    ml/offset coding tables.
    """

    def __init__(self, table_log: int = 11):
        self.table_log = table_log

    # -- token-stream <-> sequences -----------------------------------------
    @staticmethod
    def _parse_tokens(tokens: bytes):
        lits = bytearray()
        seqs: List[Tuple[int, int, int]] = []  # (lit_run, match_len, dist)
        pos, run = 0, 0
        n = len(tokens)
        while pos < n:
            flag = tokens[pos]
            pos += 1
            if flag == 0:
                (length,) = struct.unpack_from("<H", tokens, pos)
                pos += 2
                lits += tokens[pos:pos + length]
                pos += length
                run += length
            else:
                mlen = tokens[pos] + _MIN_MATCH
                pos += 1
                (dist,) = struct.unpack_from("<I", tokens, pos)
                pos += 4
                seqs.append((run, mlen, dist))
                run = 0
        return bytes(lits), seqs, run  # run = trailing literal count

    @staticmethod
    def _emit_tokens(lits: bytes, seqs, trailing: int) -> bytes:
        out = bytearray()
        lpos = 0

        def emit_lits(count):
            nonlocal lpos
            while count:
                chunk = min(count, 65535)
                out.append(0)
                out.extend(struct.pack("<H", chunk))
                out.extend(lits[lpos:lpos + chunk])
                lpos += chunk
                count -= chunk

        for run, mlen, dist in seqs:
            emit_lits(run)
            out.append(1)
            out.append(mlen - _MIN_MATCH)
            out.extend(struct.pack("<I", dist))
        emit_lits(trailing)
        return bytes(out)

    # -- codec interface ------------------------------------------------------
    def compress(self, data) -> bytes:
        tokens = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data, np.uint8).tobytes()
        lits, seqs, trailing = self._parse_tokens(tokens)

        ll_codes, ml_syms, off_codes = [], [], []
        extra = _BitWriter()
        for run, mlen, dist in seqs:
            c, nb, ev = _bucket(run)
            ll_codes.append(c)
            extra.write(ev, nb)
            ml_syms.append(mlen - _MIN_MATCH)
            c, nb, ev = _bucket(dist)
            off_codes.append(c)
            extra.write(ev, nb)
        extra_bytes = extra.bytes()

        parts = [
            _tans_code_stream(np.frombuffer(lits, np.uint8).astype(np.int32),
                              256, self.table_log),
            _tans_code_stream(np.array(ll_codes, np.int32), _SEQ_ALPHABET,
                              self.table_log),
            _tans_code_stream(np.array(ml_syms, np.int32), 256,
                              self.table_log),
            _tans_code_stream(np.array(off_codes, np.int32), _SEQ_ALPHABET,
                              self.table_log),
        ]
        head = struct.pack("<IIII", len(lits), len(seqs), trailing,
                           len(extra_bytes))
        return head + b"".join(parts) + extra_bytes

    def decompress(self, data: bytes) -> bytes:
        nlits, nseq, trailing, nextra = struct.unpack_from("<IIII", data, 0)
        pos = 16
        lits_arr, pos = _tans_decode_stream(data, pos, nlits, 256,
                                            self.table_log)
        ll_codes, pos = _tans_decode_stream(data, pos, nseq, _SEQ_ALPHABET,
                                            self.table_log)
        ml_syms, pos = _tans_decode_stream(data, pos, nseq, 256,
                                           self.table_log)
        off_codes, pos = _tans_decode_stream(data, pos, nseq, _SEQ_ALPHABET,
                                             self.table_log)
        reader = _BitReader(data[pos:pos + nextra])

        seqs = []
        for i in range(nseq):
            c = int(ll_codes[i])
            run = 0 if c == 0 else (1 << (c - 1)) + reader.read(c - 1)
            mlen = int(ml_syms[i]) + _MIN_MATCH
            c = int(off_codes[i])
            dist = 0 if c == 0 else (1 << (c - 1)) + reader.read(c - 1)
            seqs.append((run, mlen, dist))
        return self._emit_tokens(lits_arr.astype(np.uint8).tobytes(), seqs,
                                 trailing)
