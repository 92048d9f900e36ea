"""Quantized-tensor entropy codec.

Parity target: TorchQuantizedEntropyCoder (reference
cbench/modules/entropy_coder/__init__.py) — codes arbitrary tensors by
uniform quantization over a data_range at a given precision, with the prior
in one of several formats: "uniform" (flat), "adaptive" (per-channel
histogram, shipped in the stream header), or caller-provided categorical
"prob"/"logit" tables.

Host-side numpy + the native rANS backend (this is byte plumbing, not a
TPU compute path).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from ..coding.rans import Rans64Decoder, Rans64Encoder
from ..nn.entropy_models import export_cdf_tables
from .base import CodecInterface


class QuantizedTensorCodec(CodecInterface):
    """Uniformly quantize + rANS-code float/int tensors.

    data_range: (lo, hi) clip/scale range for float data.
    precision: quantization bits (K = 2^precision levels).
    prior: "uniform" | "adaptive" | np.ndarray of per-channel probabilities
      (C, K) ("prob" format) or logits ("logit" with from_logits=True).
    channel_axis: which axis indexes the per-channel priors (-1 = last).
    """

    MAGIC = b"QT2"
    _PRIOR_CODES = {"uniform": 0, "adaptive": 1, "fixed": 2}

    def __init__(self, data_range: Tuple[float, float] = (0.0, 1.0),
                 precision: int = 8, prior="adaptive",
                 from_logits: bool = False, channel_axis: int = -1):
        self.data_range = (float(data_range[0]), float(data_range[1]))
        self.precision = int(precision)
        self.levels = 1 << self.precision
        self.channel_axis = channel_axis
        self.from_logits = from_logits
        if isinstance(prior, str):
            if prior not in ("uniform", "adaptive"):
                raise ValueError(prior)
            self.prior_mode = prior
            self.prior_pmf = None
        else:
            arr = np.asarray(prior, np.float64)
            if self.from_logits:
                arr = np.exp(arr - arr.max(-1, keepdims=True))
            arr = arr / arr.sum(-1, keepdims=True)
            if arr.shape[-1] != self.levels:
                raise ValueError("prior rows must have 2^precision entries")
            self.prior_mode = "fixed"
            self.prior_pmf = arr

    # -- quantization ----------------------------------------------------------
    def _quantize(self, data: np.ndarray) -> np.ndarray:
        lo, hi = self.data_range
        if np.issubdtype(data.dtype, np.integer):
            return np.clip(data - int(lo), 0, self.levels - 1).astype(np.int32)
        t = (np.clip(data, lo, hi) - lo) / max(hi - lo, 1e-12)
        return np.clip(np.round(t * (self.levels - 1)), 0,
                       self.levels - 1).astype(np.int32)

    def _dequantize(self, symbols: np.ndarray, dtype) -> np.ndarray:
        lo, hi = self.data_range
        if np.issubdtype(np.dtype(dtype), np.integer):
            return (symbols + int(lo)).astype(dtype)
        return (symbols.astype(np.float64) / (self.levels - 1)
                * (hi - lo) + lo).astype(dtype)

    # -- priors ----------------------------------------------------------------
    def _channels(self, shape) -> int:
        return shape[self.channel_axis] if shape else 1

    def _adaptive_pmf(self, symbols: np.ndarray) -> np.ndarray:
        ch = np.moveaxis(symbols, self.channel_axis, 0)
        pmf = np.empty((ch.shape[0], self.levels), np.float64)
        for c in range(ch.shape[0]):
            counts = np.bincount(ch[c].reshape(-1),
                                 minlength=self.levels).astype(np.float64)
            pmf[c] = (counts + 0.5) / (counts.sum() + 0.5 * self.levels)
        return pmf

    def _coder_pair(self, pmf: np.ndarray):
        rows = pmf.shape[0]
        cdfs, sizes, offs = export_cdf_tables(
            pmf, np.zeros(rows), np.full(rows, self.levels),
            np.zeros(rows, np.int32))
        enc = Rans64Encoder(bypass_coding=True)
        dec = Rans64Decoder(bypass_coding=True)
        enc.init_cdf_params(cdfs, sizes, offs)
        dec.init_cdf_params(cdfs, sizes, offs)
        return enc, dec

    def _indexes(self, shape) -> np.ndarray:
        c = self._channels(shape)
        idx = np.zeros(shape, np.int32)
        idx = np.moveaxis(idx, self.channel_axis, 0)
        idx += np.arange(c, dtype=np.int32).reshape((c,) + (1,) * (idx.ndim - 1))
        return np.moveaxis(idx, 0, self.channel_axis)

    # -- codec interface -------------------------------------------------------
    def compress(self, data) -> bytes:
        data = np.asarray(data)
        symbols = self._quantize(data)
        shape = data.shape
        q = None
        if self.prior_mode == "adaptive":
            # Quantize the histogram FIRST and encode with the quantized
            # version — the decoder rebuilds its tables from the shipped
            # 16-bit freqs, so both sides must see identical pmf rows.
            raw = self._adaptive_pmf(symbols)
            q = np.clip(np.round(raw * 65535), 1, 65535).astype(np.uint16)
            pmf = q.astype(np.float64) / q.sum(-1, keepdims=True)
        elif self.prior_mode == "fixed":
            pmf = self.prior_pmf
        else:
            pmf = np.full((self._channels(shape), self.levels),
                          1.0 / self.levels)
        enc, _ = self._coder_pair(pmf)
        stream = enc.encode_with_indexes(symbols.reshape(-1),
                                         self._indexes(shape).reshape(-1))

        # prior_mode + precision ride in the header so a mismatched decoder
        # instance errors instead of misparsing histogram bytes as rANS data.
        header = self.MAGIC + struct.pack(
            "<BBBB", len(shape), {"f": 0, "i": 1, "u": 2}[data.dtype.kind],
            self._PRIOR_CODES[self.prior_mode], self.precision)
        header += struct.pack(f"<{len(shape)}I", *shape)
        header += struct.pack("<B", data.dtype.itemsize)
        if q is not None:
            # ship the per-channel histogram as 16-bit quantized freqs
            header += q.tobytes()
        return header + stream

    def decompress(self, data: bytes):
        if data[:3] != self.MAGIC:
            raise ValueError("bad stream")
        ndim, kind_code, prior_code, precision = struct.unpack_from(
            "<BBBB", data, 3)
        off = 7
        if prior_code != self._PRIOR_CODES[self.prior_mode]:
            modes = {v: k for k, v in self._PRIOR_CODES.items()}
            raise ValueError(
                f"stream was encoded with prior_mode="
                f"{modes.get(prior_code, prior_code)!r} but this codec is "
                f"configured with {self.prior_mode!r}")
        if precision != self.precision:
            raise ValueError(
                f"stream was encoded at precision={precision} but this codec "
                f"is configured with precision={self.precision}")
        shape = struct.unpack_from(f"<{ndim}I", data, off)
        off += 4 * ndim
        itemsize = struct.unpack_from("<B", data, off)[0]
        off += 1
        kind = {0: "f", 1: "i", 2: "u"}[kind_code]
        dtype = np.dtype(f"{kind}{itemsize}")

        if self.prior_mode == "adaptive":
            c = self._channels(shape)
            n = c * self.levels * 2
            q = np.frombuffer(data[off:off + n], np.uint16).reshape(
                c, self.levels).astype(np.float64)
            pmf = q / q.sum(-1, keepdims=True)
            off += n
        elif self.prior_mode == "fixed":
            pmf = self.prior_pmf
        else:
            pmf = np.full((self._channels(shape), self.levels),
                          1.0 / self.levels)
        _, dec = self._coder_pair(pmf)
        symbols = dec.decode_with_indexes(
            data[off:], self._indexes(shape).reshape(-1)).reshape(shape)
        return self._dequantize(symbols, dtype)
