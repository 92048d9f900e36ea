"""Entropy-coding byte codecs: static-table rANS/tANS and Huffman.

Parity targets: the reference's lossless entropy coder zoo —
cbench/modules/entropy_coder/huffman.py (Huffman over byte histograms),
ans.py/fse.py (table-based coding of byte streams with transmitted
frequency tables).
"""

from __future__ import annotations

import heapq
import struct
from collections import Counter
from typing import Dict

import numpy as np

from ..utils.bytes_ops import merge_bytes, split_merged_bytes
from .base import CodecInterface


class RansByteCodec(CodecInterface):
    """Lossless byte codec: histogram -> quantized CDF -> rANS64.

    The 256-entry frequency table is transmitted (u16 per symbol after
    16-bit normalization), then the payload is one rANS stream.
    """

    def __init__(self, coder: str = "rans"):
        self.coder = coder

    def _make_pair(self, freqs: np.ndarray):
        if self.coder == "tans":
            from ..coding.tans import TansDecoder, TansEncoder
            enc = TansEncoder(max_symbol_value=256, bypass_coding=True)
            dec = TansDecoder(max_symbol_value=256, bypass_coding=True)
        else:
            from ..coding.rans import Rans64Decoder, Rans64Encoder
            enc = Rans64Encoder(bypass_coding=True)
            dec = Rans64Decoder(bypass_coding=True)
        table = freqs[None, :].astype(np.int32)
        nsym = np.array([256], np.int32)
        offs = np.zeros(1, np.int32)
        enc.init_params(table, nsym, offs)
        dec.init_params(table, nsym, offs)
        return enc, dec

    def compress(self, data) -> bytes:
        raw = np.frombuffer(bytes(data) if isinstance(data, (bytes, bytearray))
                            else np.asarray(data, np.uint8).tobytes(), np.uint8)
        freqs = np.bincount(raw, minlength=256).astype(np.int64)
        freqs = np.maximum(freqs, 1)
        enc, _ = self._make_pair(freqs)
        stream = enc.encode_with_indexes(raw.astype(np.int32),
                                         np.zeros(raw.size, np.int32))
        header = struct.pack("<I", raw.size) + \
            np.minimum(freqs, 0xFFFFFFFF).astype("<u4").tobytes()
        return merge_bytes([header, stream], num_segments=2)

    def decompress(self, data: bytes) -> bytes:
        header, stream = split_merged_bytes(data, num_segments=2)
        (n,) = struct.unpack("<I", header[:4])
        freqs = np.frombuffer(header[4:4 + 1024], "<u4").astype(np.int64)
        _, dec = self._make_pair(freqs)
        syms = dec.decode_with_indexes(stream, np.zeros(n, np.int32))
        return syms.astype(np.uint8).tobytes()


class HuffmanCodec(CodecInterface):
    """Canonical Huffman over byte histograms (parity: entropy coder
    huffman.py). Code lengths are transmitted (1 byte per symbol)."""

    @staticmethod
    def _code_lengths(freqs: Dict[int, int]) -> Dict[int, int]:
        heap = [(f, i, (s,)) for i, (s, f) in enumerate(freqs.items())]
        heapq.heapify(heap)
        lengths = {s: 0 for s in freqs}
        if len(heap) == 1:
            return {next(iter(freqs)): 1}
        uid = len(heap)
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                lengths[s] += 1
            heapq.heappush(heap, (f1 + f2, uid, s1 + s2))
            uid += 1
        return lengths

    @staticmethod
    def _canonical_codes(lengths: Dict[int, int]) -> Dict[int, tuple]:
        items = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
        codes = {}
        code = 0
        prev_len = 0
        for sym, ln in items:
            code <<= (ln - prev_len)
            codes[sym] = (code, ln)
            code += 1
            prev_len = ln
        return codes

    def compress(self, data) -> bytes:
        raw = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data, np.uint8).tobytes()
        if not raw:
            return struct.pack("<I", 0)
        freqs = Counter(raw)
        lengths = self._code_lengths(freqs)
        codes = self._canonical_codes(lengths)
        len_table = bytes(lengths.get(s, 0) for s in range(256))
        acc, nbits = 0, 0
        out = bytearray()
        for b in raw:
            c, ln = codes[b]
            acc = (acc << ln) | c
            nbits += ln
            while nbits >= 8:
                nbits -= 8
                out.append((acc >> nbits) & 0xFF)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return struct.pack("<I", len(raw)) + len_table + bytes(out)

    def decompress(self, data: bytes) -> bytes:
        (n,) = struct.unpack("<I", data[:4])
        if n == 0:
            return b""
        lengths = {s: l for s, l in enumerate(data[4:260]) if l > 0}
        codes = self._canonical_codes(lengths)
        decode = {v: k for k, v in codes.items()}
        payload = data[260:]
        out = bytearray()
        code, ln = 0, 0
        bitpos = 0
        total_bits = len(payload) * 8
        while len(out) < n and bitpos < total_bits:
            byte = payload[bitpos >> 3]
            bit = (byte >> (7 - (bitpos & 7))) & 1
            code = (code << 1) | bit
            ln += 1
            bitpos += 1
            if (code, ln) in decode:
                out.append(decode[(code, ln)])
                code, ln = 0, 0
        return bytes(out)


class BufferedRansEncoder:
    """CompressAI-interface-compatible buffered encoder, BIT-COMPATIBLE with
    the reference's legacy `cbench.rans` module
    (csrc/rans/rans_interface.cpp:107-221): symbols buffer with explicit
    per-call CDF tables; flush emits ONE rans stream encoding all chunks
    back-to-front so decode reads chunk 1 first.

    Implementation: the native coder's cache mode resolves each chunk's
    symbols against its tables immediately; flush replays the chunks in
    REVERSE order into one cached stream (the native cache stores a chunk
    reversed, so reversed chunk order reproduces the reference's exact
    back-to-front symbol push sequence — golden case c10)."""

    def __init__(self):
        self._chunks = []  # (symbols, indexes, cdfs, sizes, offsets)

    def encode_with_indexes_np(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        self._chunks.append((np.asarray(symbols, np.int32),
                             np.asarray(indexes, np.int32),
                             np.asarray(cdfs, np.int32),
                             np.asarray(cdf_sizes, np.int32),
                             np.asarray(offsets, np.int32)))

    def flush(self) -> bytes:
        from ..coding.rans import Rans64Encoder
        if not self._chunks:
            return b""
        enc = Rans64Encoder(bypass_coding=True)
        for symbols, indexes, cdfs, sizes, offsets in reversed(self._chunks):
            enc.init_cdf_params(cdfs, sizes, offsets)
            enc.encode_with_indexes(symbols, indexes, cache=True)
        self._chunks = []
        return enc.flush()


class BufferedRansDecoder:
    """Counterpart to BufferedRansEncoder: streaming chunk decode over the
    single flushed stream with per-call CDF tables (the reference
    RansDecoder set_stream/decode_stream protocol,
    rans_interface.cpp:317-409). `num_chunks` is accepted for backward
    compatibility and unused."""

    def __init__(self, stream: bytes, num_chunks: int = 0):
        from ..coding.rans import Rans64Decoder
        self._dec = Rans64Decoder(bypass_coding=True)
        self._stream = stream
        self._started = False

    def decode_next(self, indexes, cdfs, cdf_sizes, offsets):
        self._dec.init_cdf_params(np.asarray(cdfs, np.int32),
                                  np.asarray(cdf_sizes, np.int32),
                                  np.asarray(offsets, np.int32))
        if not self._started:
            self._dec.set_stream(self._stream)
            self._started = True
        return self._dec.decode_stream(np.asarray(indexes, np.int32))
