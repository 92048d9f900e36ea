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

    def __init__(self, inner: CodecInterface, tile: int = 1024,
                 batched: bool = True, max_batch: int = 16):
        self.inner = inner
        self.tile = tile
        # batched: group equal-size tiles into the inner codec's
        # compress_batch/decompress_batch (one fused device dispatch per
        # tile-size group instead of one per tile) — the TPU-right way to
        # code a 4K image: a 4096x2160 frame at tile=512 is a couple of
        # fused batch dispatches plus one edge-row dispatch.
        self.batched = batched
        # max_batch caps tiles per fused dispatch: the fused encode/decode
        # keeps per-tile activations + symbol buffers live in HBM, and a
        # full 4K frame at tile=512 as ONE batch-64 dispatch needs ~16.4 GB
        # (> v5e's 15.75): chunking trades a few dispatches for fitting.
        self.max_batch = max_batch

    def _tile_groups(self, tiles):
        """Equal-size tile index chunks, each at most max_batch long (the
        chunking is a pure function of (tiles, max_batch), so compress and
        decompress always derive the same blob layout)."""
        groups = {}
        for i, (_top, _left, th, tw) in enumerate(tiles):
            groups.setdefault((th, tw), []).append(i)
        chunks = []
        for idxs in groups.values():
            for k in range(0, len(idxs), self.max_batch):
                chunks.append(idxs[k:k + self.max_batch])
        return chunks

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
        tiles = self._tiles(h, w)
        if (self.batched and len(tiles) > 1
                and hasattr(self.inner, "compress_batch")):
            blobs = []
            for idxs in self._tile_groups(tiles):
                group = [img[t:t + gh, l:l + gw]
                         for t, l, gh, gw in (tiles[i] for i in idxs)]
                blobs.append(self.inner.compress_batch(group))
            return (b"\x01" + encode_shape((h, w))
                    + merge_bytes(blobs, num_segments=len(blobs)))
        streams = []
        for top, left, th, tw in tiles:
            streams.append(self.inner.compress(img[top:top + th, left:left + tw]))
        return (b"\x00" + encode_shape((h, w))
                + merge_bytes(streams, num_segments=len(streams)))

    def decompress(self, data: bytes):
        batched, data = data[0] == 1, data[1:]
        (h, w), hdr = decode_shape(data)
        tiles = self._tiles(h, w)
        out = None

        def place(i, rec):
            nonlocal out
            top, left, th, tw = tiles[i]
            rec = np.asarray(rec)
            if out is None:
                out = np.zeros((h, w) + rec.shape[2:], rec.dtype)
            out[top:top + th, left:left + tw] = rec[:th, :tw]

        if batched:
            groups = self._tile_groups(tiles)
            blobs = split_merged_bytes(data[hdr:], num_segments=len(groups))
            for idxs, blob in zip(groups, blobs):
                recs = self.inner.decompress_batch(blob)
                for i, rec in zip(idxs, recs):
                    place(i, rec)
            return out
        streams = split_merged_bytes(data[hdr:], num_segments=len(tiles))
        for i, stream in enumerate(streams):
            place(i, self.inner.decompress(stream))
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
