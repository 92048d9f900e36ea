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


class BrotliCodec(_BytesCodec):
    """Brotli byte codec (parity: reference configs/codecs/pycodecs/
    brotli.py over its brotli wrapper). The brotli module is not baked
    into this image; construction is allowed (config surface stays
    importable) and first use raises a clear error."""

    default_level = 9

    def _compress_bytes(self, raw):
        import brotli
        return brotli.compress(raw, quality=self.level)

    def _decompress_bytes(self, data):
        import brotli
        return brotli.decompress(data)


class PickleCodec(CodecInterface):
    """Pickle-serialize arbitrary objects to bytes (parity: reference
    cbench/codecs/base.py PickleCodec, configs/codecs/pickle.py)."""

    def compress(self, data) -> bytes:
        import pickle
        return pickle.dumps(data)

    def decompress(self, data: bytes):
        import pickle
        return pickle.loads(data)


class ZstdDictCodec(ZstdCodec):
    """Zstd with a TRAINED dictionary, self-trainable from a dataloader.

    Parity: ZstdDictWrapperCodec (reference cbench/codecs/zstd_wrapper.py:
    58-185; configs/codecs/zstd_wrapper/dict.py dict_size slot): the codec
    trains its dictionary on the training split before benchmarking via
    the SelfTrainableInterface protocol (codecs/base.py:26).
    """

    def __init__(self, levels=None, dict_size: int = 32 * 1024,
                 max_train_samples: int = 256, train_dataloader=None):
        super().__init__(levels)
        self.dict_size = dict_size
        self.max_train_samples = max_train_samples
        self.train_dataloader = train_dataloader

    # SelfTrainableInterface protocol (codecs/base.py:26): the benchmark
    # calls train_self() before testing when is_trainable.
    @property
    def is_trainable(self) -> bool:
        return self.train_dataloader is not None

    def train_self(self):
        return self.train_full(self.train_dataloader)

    def train_full(self, dataloader, *args, **kwargs):
        samples = []
        for i, item in enumerate(dataloader):
            if i >= self.max_train_samples:
                break
            if isinstance(item, (bytes, bytearray)):
                samples.append(bytes(item))
            else:
                samples.append(np.asarray(item).astype(np.uint8).tobytes())
        if samples:
            self.train_dictionary(samples, self.dict_size)
        return {"dict_bytes": len(self._dict or b"")}
