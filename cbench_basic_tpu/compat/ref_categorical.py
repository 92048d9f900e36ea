"""Bit-compatible port of the reference AutoregressiveEntropyCoder's
non-AR rans path (cbench/modules/entropy_coder/autoregressive.py:368-558,
560-763, 765-830).

Module stream layout (autoregressive.py:546-558):
  [u8 ndim_spatial+1][u16 batch][u16 spatial dims...] + rans stream
Symbols are TRUNCATED (``((x - lo)/step).long()``, :381), unlike the
Gaussian module's rounding — a reference quirk preserved here.
Tables: per-channel softmax of the trainable prior logits, quantized with
the CompressAI pmf_to_quantized_cdf (tail mass 1e-10 appended,
entropy_coder/rans.py:17-23), one cdf row per channel.
"""

from __future__ import annotations

import struct

import numpy as np

from ..coding.rans import Rans64Decoder, Rans64Encoder, pmf_to_quantized_cdf


def _log_softmax32(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(-1, keepdims=True))


class RefCategoricalCoder:
    def __init__(self, prior_logprob: np.ndarray,
                 data_range=(0.0, 1.0), data_precision: int = 8,
                 freq_precision: int = 16, tail_mass: float = 1e-10):
        self.prior_logprob = np.asarray(prior_logprob, np.float32)
        self.channel_dim = self.prior_logprob.shape[0]
        self.data_range = (float(data_range[0]), float(data_range[1]))
        self.data_precision = int(data_precision)
        self.data_step = (self.data_range[1] - self.data_range[0]) \
            / (self.data_precision - 1)
        self.freq_precision = freq_precision
        self.tail_mass = tail_mass
        self._cdfs = None

    def build_cdfs(self) -> np.ndarray:
        pmf = np.exp(_log_softmax32(self.prior_logprob))
        pmf = np.concatenate(
            [pmf, np.full((len(pmf), 1), self.tail_mass, np.float32)], axis=1)
        rows = [pmf_to_quantized_cdf(row.astype(np.float64),
                                     self.freq_precision) for row in pmf]
        return np.asarray(rows, np.int32)

    def _pair(self):
        if self._cdfs is None:
            self._cdfs = self.build_cdfs()
        sizes = np.full(len(self._cdfs), self._cdfs.shape[1], np.int32)
        offs = np.zeros(len(self._cdfs), np.int32)
        enc = Rans64Encoder(bypass_coding=True)
        dec = Rans64Decoder(bypass_coding=True)
        enc.init_cdf_params(self._cdfs, sizes, offs)
        dec.init_cdf_params(self._cdfs, sizes, offs)
        return enc, dec

    def _indexes(self, shape) -> np.ndarray:
        b, c = shape[0], shape[1]
        spatial = int(np.prod(shape[2:]))
        return np.broadcast_to(
            np.arange(c, dtype=np.int32)[None, :, None],
            (b, c, spatial)).reshape(shape)

    def encode(self, data: np.ndarray) -> bytes:
        data = np.asarray(data, np.float32)
        # truncation, not rounding (autoregressive.py:381 ``.long()``)
        symbols = ((data - np.float32(self.data_range[0]))
                   / np.float32(self.data_step)).astype(np.int64)
        symbols = symbols.astype(np.int32)
        enc, _ = self._pair()
        stream = enc.encode_with_indexes(
            symbols.reshape(-1), self._indexes(data.shape).reshape(-1))
        spatial = data.shape[2:]
        head = [struct.pack("B", len(spatial) + 1),
                struct.pack("<H", data.shape[0])]
        head += [struct.pack("<H", d) for d in spatial]
        return b"".join(head) + stream

    def decode(self, stream: bytes) -> np.ndarray:
        ndim = struct.unpack_from("B", stream, 0)[0]
        dims = struct.unpack_from(f"<{ndim}H", stream, 1)
        off = 1 + 2 * ndim
        batch, spatial = dims[0], tuple(dims[1:])
        shape = (batch, self.channel_dim) + spatial
        _, dec = self._pair()
        symbols = dec.decode_with_indexes(
            stream[off:], self._indexes(shape).reshape(-1))
        out = np.asarray(symbols, np.float32).reshape(shape)
        return out * np.float32(self.data_step) \
            + np.float32(self.data_range[0])
