"""Tiled inference wrapper for large (e.g. 4K) images.

The reference has no tiling pipeline (SURVEY.md §5.7 notes the 4K-tiled
config as a stretch goal); NIC codecs OOM or recompile on arbitrary large
shapes. This wrapper splits the image into fixed aligned tiles (one XLA
specialization total), codes each tile independently, and reassembles —
also the natural unit for future multi-chip spatial sharding.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..utils.bytes_ops import decode_shape, encode_shape, merge_bytes, split_merged_bytes
from .base import (
    CodecInterface,
    VariableComplexityCodecInterface,
    VariableRateCodecInterface,
)


class TiledCodec(CodecInterface, VariableRateCodecInterface,
                 VariableComplexityCodecInterface):
    """Fixed-tile compression over any inner image codec.

    tile: tile side in pixels (multiple of the inner codec's alignment).
    Edge tiles are padded by the inner codec itself (shape header per tile
    is elided — the wrapper stores the full image shape once).
    """

    def __init__(self, inner: CodecInterface, tile: int = 1024):
        self.inner = inner
        self.tile = tile

    def _tiles(self, h: int, w: int) -> List[Tuple[int, int, int, int]]:
        out = []
        for top in range(0, h, self.tile):
            for left in range(0, w, self.tile):
                out.append((top, left, min(self.tile, h - top),
                            min(self.tile, w - left)))
        return out

    def compress(self, data) -> bytes:
        img = np.asarray(data)
        h, w = img.shape[0], img.shape[1]
        streams = []
        for top, left, th, tw in self._tiles(h, w):
            streams.append(self.inner.compress(img[top:top + th, left:left + tw]))
        return encode_shape((h, w)) + merge_bytes(streams,
                                                  num_segments=len(streams))

    def decompress(self, data: bytes):
        (h, w), hdr = decode_shape(data)
        tiles = self._tiles(h, w)
        streams = split_merged_bytes(data[hdr:], num_segments=len(tiles))
        out = None
        for (top, left, th, tw), stream in zip(tiles, streams):
            rec = np.asarray(self.inner.decompress(stream))
            if out is None:
                out = np.zeros((h, w) + rec.shape[2:], rec.dtype)
            out[top:top + th, left:left + tw] = rec[:th, :tw]
        return out

    def update_state(self, *a, **k):
        self.inner.update_state(*a, **k)

    @property
    def num_rate_levels(self):
        return getattr(self.inner, "num_rate_levels", 1)

    def set_rate_level(self, level, *a, **k):
        if isinstance(self.inner, VariableRateCodecInterface):
            self.inner.set_rate_level(level, *a, **k)

    @property
    def num_complex_levels(self):
        return getattr(self.inner, "num_complex_levels", 1)

    def set_complex_level(self, level, *a, **k):
        if isinstance(self.inner, VariableComplexityCodecInterface):
            self.inner.set_complex_level(level, *a, **k)

    def get_current_complex_metrics(self):
        if isinstance(self.inner, VariableComplexityCodecInterface):
            return self.inner.get_current_complex_metrics()
        return {}
