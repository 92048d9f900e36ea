"""Bit-compatible port of the reference RansEntropyCoder module.

Reference: cbench/modules/entropy_coder/rans.py:26-194 — per-ELEMENT prior
coding: the prior tensor carries a probability row per data element
("prob"/"logit" formats) or Gaussian moments expanded to a row over the
quantization grid ("gaussian", torch_base.py:62-78); rows quantize through
the FAST batched cumsum quantizer (rans.py:26-69: +1 floor, iterative
sum-step renormalization while any row exceeds 2^precision) and code with
indexes = arange through the CompressAI-style rans backend.
"""

from __future__ import annotations

import math

import numpy as np

from ..coding.rans import Rans64Decoder, Rans64Encoder

_LOG_SQRT_2PI = math.log(math.sqrt(2 * math.pi))


def batched_quantized_cdf(pmf: np.ndarray, tail_mass: float = 1e-10,
                          freq_precision: int = 16) -> np.ndarray:
    """The reference's pmf_to_quantized_cdf_batched (rans.py:26-69) in the
    same float32 op order: append tail, normalize, scale by 2^P with a +1
    floor, renormalize with a growing per-row sum step until every row sums
    within 2^P, cumsum, truncate to int."""
    max_index = float(1 << freq_precision)
    pmf = np.asarray(pmf, np.float32)
    pmf = np.concatenate(
        [pmf, np.full((len(pmf), 1), tail_mass, np.float32)], axis=1)
    pmf = pmf / pmf.sum(1, keepdims=True)
    pmf_norm = pmf * np.float32(max_index) + np.float32(1.0)
    step = np.float32(pmf.shape[-1] // 2)
    pmf_norm_int = np.round(
        pmf_norm * np.float32(max_index)
        / (pmf_norm.sum(1, keepdims=True) + step))
    cdf_max = pmf_norm_int.sum(1, keepdims=True)
    # iterative renormalization, pmf_sum seeded from the integer row sums
    # and grown by `step` on overflowing rows only (reference :43-49 —
    # note EVERY row renormalizes against its pmf_sum each iteration)
    pmf_sum = cdf_max.copy()
    while np.any(cdf_max > max_index):
        pmf_sum = np.where(cdf_max > max_index, pmf_sum + step, pmf_sum)
        pmf_norm_int = np.round(pmf_norm_int * np.float32(max_index)
                                / pmf_sum)
        cdf_max = pmf_norm_int.sum(1, keepdims=True)
    cdf = np.cumsum(pmf_norm_int.astype(np.float32), axis=1,
                    dtype=np.float32)
    cdf = np.concatenate(
        [np.zeros((len(pmf), 1), np.float32), cdf], axis=1)
    return cdf.astype(np.int32)


class RefRansPriorCoder:
    """prior_format "prob" | "logit" | "gaussian" (torch_base.py:62-78)."""

    def __init__(self, data_range=(0.0, 1.0), data_precision: int = 256,
                 prior_format: str = "logit", freq_precision: int = 16,
                 tail_mass: float = 1e-8):
        self.data_range = (float(data_range[0]), float(data_range[1]))
        self.data_precision = int(data_precision)
        self.data_step = (self.data_range[1] - self.data_range[0]) \
            / (self.data_precision - 1)
        self.prior_format = prior_format
        self.freq_precision = freq_precision
        self.tail_mass = tail_mass

    def _softmax32(self, x):
        x = np.asarray(x, np.float32)
        m = x.max(-1, keepdims=True)
        e = np.exp(x - m)
        return e / e.sum(-1, keepdims=True)

    def prior_rows(self, prior: np.ndarray) -> np.ndarray:
        prior = np.asarray(prior, np.float32)
        if self.prior_format == "prob":
            rows = prior
        elif self.prior_format == "logit":
            rows = self._softmax32(prior)
        elif self.prior_format == "gaussian":
            mean = prior[..., :1]
            logvar = prior[..., 1:]
            scale = np.exp(logvar)
            pts = np.arange(self.data_range[0],
                            self.data_range[1] + self.data_step,
                            self.data_step,
                            dtype=np.float64).astype(np.float32)
            pts = pts[:self.data_precision]
            logp = (-((pts - mean) ** 2) / (2 * scale ** 2)
                    - np.log(scale) - np.float32(_LOG_SQRT_2PI))
            rows = self._softmax32(logp)
        else:
            raise ValueError(self.prior_format)
        return rows.reshape(-1, rows.shape[-1])

    def symbols(self, data: np.ndarray) -> np.ndarray:
        data = np.asarray(data, np.float32)
        return np.round((data - np.float32(self.data_range[0]))
                        / np.float32(self.data_step)).astype(np.int32)

    def _pair(self, rows):
        cdfs = batched_quantized_cdf(rows, self.tail_mass,
                                     self.freq_precision)
        sizes = np.full(len(cdfs), cdfs.shape[1], np.int32)
        offs = np.zeros(len(cdfs), np.int32)
        enc = Rans64Encoder(bypass_coding=True)
        dec = Rans64Decoder(bypass_coding=True)
        enc.init_cdf_params(cdfs, sizes, offs)
        dec.init_cdf_params(cdfs, sizes, offs)
        return enc, dec

    def encode(self, data: np.ndarray, prior: np.ndarray) -> bytes:
        rows = self.prior_rows(prior)
        sym = self.symbols(data).reshape(-1)
        enc, _ = self._pair(rows)
        return enc.encode_with_indexes(
            sym, np.arange(len(sym), dtype=np.int32))

    def decode(self, stream: bytes, prior: np.ndarray) -> np.ndarray:
        rows = self.prior_rows(prior)
        _, dec = self._pair(rows)
        sym = dec.decode_with_indexes(
            stream, np.arange(len(rows), dtype=np.int32))
        shape = np.asarray(prior).shape[:-1]
        out = np.asarray(sym, np.float32).reshape(shape)
        return out * np.float32(self.data_step) \
            + np.float32(self.data_range[0])
