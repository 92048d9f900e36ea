"""Classical lossless byte codecs.

Parity: reference cbench/codecs/pycodecs.py:28-177 (zstd/zlib/lzma/bz2-style
byte codec wrappers with compression-level rate levels) and
zstd_wrapper.py dictionary training (zstandard's native dict trainer).
"""

from __future__ import annotations

import bz2
import lzma
import zlib
from typing import List, Optional

import numpy as np

from .base import CodecInterface, VariableRateCodecInterface


class _BytesCodec(CodecInterface, VariableRateCodecInterface):
    """Base: operates on bytes or uint8 arrays (shape restored via header)."""

    def __init__(self, levels: Optional[List[int]] = None):
        self.levels = levels or [self.default_level]
        self._level_idx = len(self.levels) - 1

    default_level = 0

    @property
    def num_rate_levels(self):
        return len(self.levels)

    def set_rate_level(self, level: int, *args, **kwargs):
        self._level_idx = level

    @property
    def level(self):
        return self.levels[self._level_idx]

    def _compress_bytes(self, raw: bytes) -> bytes:
        raise NotImplementedError

    def _decompress_bytes(self, data: bytes) -> bytes:
        raise NotImplementedError

    def compress(self, data) -> bytes:
        from ..utils.bytes_ops import encode_shape
        if isinstance(data, (bytes, bytearray)):
            data = np.frombuffer(bytes(data), np.uint8)
        arr = np.asarray(data)
        if arr.dtype == object:
            raise TypeError("bytes codec needs bytes or uint8 array")
        header = encode_shape(arr.shape)
        return header + self._compress_bytes(arr.astype(np.uint8).tobytes())

    def decompress(self, data: bytes):
        from ..utils.bytes_ops import decode_shape
        shape, hdr = decode_shape(data)
        raw = self._decompress_bytes(data[hdr:])
        return np.frombuffer(raw, np.uint8).reshape(shape)


class ZstdCodec(_BytesCodec):
    default_level = 3

    def __init__(self, levels=None, dictionary: Optional[bytes] = None):
        super().__init__(levels or [3])
        self._dict = dictionary

    def _ctx(self):
        import zstandard
        kw = {}
        if self._dict is not None:
            kw["dict_data"] = zstandard.ZstdCompressionDict(self._dict)
        return (zstandard.ZstdCompressor(level=self.level, **kw),
                zstandard.ZstdDecompressor(**kw))

    def _compress_bytes(self, raw):
        return self._ctx()[0].compress(raw)

    def _decompress_bytes(self, data):
        return self._ctx()[1].decompress(data)

    def train_dictionary(self, samples: List[bytes], dict_size: int = 16384):
        """Dictionary training (parity: zstd_wrapper.py:58-185)."""
        import zstandard
        self._dict = zstandard.train_dictionary(dict_size, samples).as_bytes()
        return self._dict


class ZlibCodec(_BytesCodec):
    default_level = 6

    def _compress_bytes(self, raw):
        return zlib.compress(raw, self.level)

    def _decompress_bytes(self, data):
        return zlib.decompress(data)


class LzmaCodec(_BytesCodec):
    default_level = 6

    def _compress_bytes(self, raw):
        return lzma.compress(raw, preset=self.level)

    def _decompress_bytes(self, data):
        return lzma.decompress(data)


class Bz2Codec(_BytesCodec):
    default_level = 9

    def _compress_bytes(self, raw):
        return bz2.compress(raw, self.level)

    def _decompress_bytes(self, data):
        return bz2.decompress(data)
