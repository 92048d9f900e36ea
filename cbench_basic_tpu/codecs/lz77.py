"""LZ77 preprocessor/codec (parity: reference
cbench/modules/preprocessor/lz77.py:63-143 + lz77_dict_training.py).

Greedy hash-chain matcher producing a token stream (literals + (len, dist)
matches), serialized compactly; intended as a preprocessing stage whose
token bytes feed an entropy codec (GeneralCodec composition), or usable
standalone. Supports a prepended dictionary (parity with the dict-training
variant: matches may reach back into shared dictionary bytes that are not
transmitted).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from .base import CodecInterface

_MIN_MATCH = 4
_MAX_MATCH = 255 + _MIN_MATCH
_HASH_BITS = 15


def _hash4(data: bytes, i: int) -> int:
    v = int.from_bytes(data[i:i + 4], "little")
    return (v * 2654435761) >> (32 - _HASH_BITS) & ((1 << _HASH_BITS) - 1)


def lz77_tokenize(data: bytes, dictionary: bytes = b"",
                  max_chain: int = 16) -> bytes:
    """Token stream: [flag u8][...]*
    flag 0: literal run — u16 length + raw bytes
    flag 1: match — u8 (len - MIN_MATCH), u32 distance."""
    base = dictionary + data
    start = len(dictionary)
    n = len(base)
    heads = {}
    out = bytearray()
    lits = bytearray()

    def flush_lits():
        while lits:
            chunk = bytes(lits[:65535])
            del lits[:65535]
            out.append(0)
            out.extend(struct.pack("<H", len(chunk)))
            out.extend(chunk)

    # Seed the dictionary positions.
    for i in range(max(0, start - 4)):
        heads.setdefault(_hash4(base, i), []).append(i)

    i = start
    while i < n:
        best_len, best_dist = 0, 0
        if i + _MIN_MATCH <= n:
            h = _hash4(base, i)
            for j in reversed(heads.get(h, [])[-max_chain:]):
                if base[j:j + _MIN_MATCH] == base[i:i + _MIN_MATCH]:
                    length = _MIN_MATCH
                    limit = min(_MAX_MATCH, n - i)
                    while length < limit and base[j + length] == base[i + length]:
                        length += 1
                    if length > best_len:
                        best_len, best_dist = length, i - j
            heads.setdefault(h, []).append(i)
        if best_len >= _MIN_MATCH:
            flush_lits()
            out.append(1)
            out.append(best_len - _MIN_MATCH)
            out.extend(struct.pack("<I", best_dist))
            i += best_len
        else:
            lits.append(base[i])
            i += 1
    flush_lits()
    return bytes(out)


def lz77_detokenize(tokens: bytes, dictionary: bytes = b"") -> bytes:
    out = bytearray(dictionary)
    pos = 0
    n = len(tokens)
    while pos < n:
        flag = tokens[pos]
        pos += 1
        if flag == 0:
            (length,) = struct.unpack("<H", tokens[pos:pos + 2])
            pos += 2
            out += tokens[pos:pos + length]
            pos += length
        else:
            length = tokens[pos] + _MIN_MATCH
            pos += 1
            (dist,) = struct.unpack("<I", tokens[pos:pos + 4])
            pos += 4
            for _ in range(length):  # may self-overlap
                out.append(out[-dist])
    return bytes(out[len(dictionary):])


def train_lz77_dictionary(samples, dict_size: int = 4096, **kwargs) -> bytes:
    """Dictionary trainer: the fastcover-style iterative cover-scored
    selection (lz77_dict_training.py — parity with the reference's
    dict_training_fastcover)."""
    from .lz77_dict_training import dict_training_fastcover
    return dict_training_fastcover(samples, dict_length=dict_size, **kwargs)


def train_lz77_dictionary_frequency(samples, dict_size: int = 4096) -> bytes:
    """Round-2 baseline trainer: concatenates the most common 8-byte
    substrings. Kept as the comparison baseline for the fastcover trainer
    (tests/test_lz77_binary.py benchmarks one against the other)."""
    from collections import Counter
    counts = Counter()
    for s in samples:
        s = bytes(s)
        for i in range(0, max(0, len(s) - 8), 4):
            counts[s[i:i + 8]] += 1
    out = bytearray()
    for chunk, _ in counts.most_common():
        if len(out) + 8 > dict_size:
            break
        out += chunk
    return bytes(out)


class LZ77Codec(CodecInterface):
    """Standalone LZ77 codec (token stream, optionally entropy-coded by an
    inner byte codec)."""

    def __init__(self, inner: Optional[CodecInterface] = None,
                 dictionary: bytes = b""):
        self.inner = inner
        self.dictionary = dictionary

    def compress(self, data) -> bytes:
        raw = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data, np.uint8).tobytes()
        tokens = lz77_tokenize(raw, self.dictionary)
        return self.inner.compress(tokens) if self.inner else tokens

    def decompress(self, data: bytes) -> bytes:
        if self.inner:
            inner_out = self.inner.decompress(data)
            tokens = bytes(inner_out) if isinstance(
                inner_out, (bytes, bytearray)) else \
                np.asarray(inner_out).astype(np.uint8).tobytes()
        else:
            tokens = data
        return lz77_detokenize(tokens, self.dictionary)


class LZ77Preprocessor:
    """Preprocessor-protocol LZ77 stage (parity: reference
    cbench/modules/preprocessor/lz77.py LZ77Preprocessor and the
    configs/codecs/general/preprocessors/lz77[,_dict].py wiring): tokenize
    in preprocess so a downstream entropy coder codes the token stream;
    the shared dictionary is codec state, never transmitted."""

    def __init__(self, dictionary: bytes = b"", max_chain: int = 16):
        self.dictionary = dictionary
        self.max_chain = max_chain

    def preprocess(self, data):
        raw = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data, np.uint8).tobytes()
        return lz77_tokenize(raw, self.dictionary,
                             max_chain=self.max_chain), b""

    def postprocess(self, data, side_info: bytes = b""):
        tokens = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data).astype(np.uint8).tobytes()
        return lz77_detokenize(tokens, self.dictionary)

    def train_full(self, samples, dict_size: int = 4096, **kwargs):
        """Fit the shared dictionary from sample byte strings."""
        self.dictionary = train_lz77_dictionary(samples, dict_size=dict_size,
                                                **kwargs)
