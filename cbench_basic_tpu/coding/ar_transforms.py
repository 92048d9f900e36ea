"""Standalone autoregressive transforms (parity: reference `cbench.ar`
module, csrc/ar/ar.cpp: ar_3way_mean / autoregressive_transform_3way_*).

Flat-offset neighbor prediction over nd arrays: forward subtracts the
neighbor-mean prediction (vectorizable), inverse reconstructs sequentially.
"""

from __future__ import annotations

import ctypes as ct
from typing import List, Sequence

import numpy as np

from .rans import _as_i32, _i32p, _lib

_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_lib.ar_transform_mean_forward.argtypes = [
    _i32p, ct.c_int64, _i64p, ct.c_int, ct.c_int32, _i32p]
_lib.ar_transform_mean_inverse.argtypes = [
    _i32p, ct.c_int64, _i64p, ct.c_int, ct.c_int32, _i32p]


def flat_offsets(shape: Sequence[int], ar_dim_offsets: List[List[int]]) -> np.ndarray:
    """Per-way flat element distances (batch dim excluded), matching the
    reference's create_ar_ptr_offsets scheme (boundaries read as 0)."""
    shape = tuple(shape)
    strides = np.ones(len(shape), np.int64)
    for d in range(len(shape) - 2, -1, -1):
        strides[d] = strides[d + 1] * shape[d + 1]
    out = []
    for offs in ar_dim_offsets:
        dist = 0
        for j, off in enumerate(offs):
            if off > 0:
                raise ValueError("offsets must be non-positive")
            dist += -off * strides[j + 1]
        out.append(dist)
    return np.asarray(out, np.int64)


def ar_mean_forward(data: np.ndarray, ar_dim_offsets: List[List[int]],
                    modulus: int = 0) -> np.ndarray:
    """residual = x - mean(neighbors) (mod `modulus` when > 0 — keeps uint8
    image residuals one byte wide). Default 3-way: left/top/top-left."""
    x = _as_i32(data)
    offs = flat_offsets(x.shape, ar_dim_offsets)
    flat = np.ascontiguousarray(x.ravel())
    out = np.empty_like(flat)
    _lib.ar_transform_mean_forward(flat, flat.size, offs, len(offs), modulus, out)
    return out.reshape(x.shape)


def ar_mean_inverse(residual: np.ndarray, ar_dim_offsets: List[List[int]],
                    modulus: int = 0) -> np.ndarray:
    r = _as_i32(residual)
    offs = flat_offsets(r.shape, ar_dim_offsets)
    flat = np.ascontiguousarray(r.ravel())
    out = np.zeros_like(flat)
    _lib.ar_transform_mean_inverse(flat, flat.size, offs, len(offs), modulus, out)
    return out.reshape(r.shape)


THREE_WAY_IMAGE_OFFSETS = [[0, -1, 0], [0, 0, -1], [0, -1, -1]]
