"""tANS (FSE-style) entropy coder — ctypes binding.

Public surface mirrors the reference `cbench.ans` TansEncoder/TansDecoder
(tans.hpp:147-157): table_log + max_symbol_value construction, init_params /
init_ar_params / encode_with_indexes / decode_with_indexes, plus streaming
decode (which the reference left unimplemented, tans.cpp:853-915).
"""

from __future__ import annotations

import ctypes as ct

import numpy as np

from .rans import _as_i32, _i32p, _f32p, _u8p, _lib

_lib.tans_ctx_new.restype = ct.c_void_p
_lib.tans_ctx_new.argtypes = [ct.c_uint, ct.c_uint, ct.c_int, ct.c_uint]
_lib.tans_ctx_free.argtypes = [ct.c_void_p]
_lib.tans_last_error.restype = ct.c_char_p
_lib.tans_last_error.argtypes = [ct.c_void_p]
_lib.tans_init_params.restype = ct.c_int
_lib.tans_init_params.argtypes = [ct.c_void_p, _i32p, ct.c_int64, _i32p, _i32p,
                                  ct.c_int64, ct.c_int, ct.c_int]
_lib.tans_init_ar_params.restype = ct.c_int
_lib.tans_init_ar_params.argtypes = [ct.c_void_p, _i32p, ct.c_int64, ct.c_int64,
                                     ct.c_int64, ct.c_int64, ct.c_int]
_lib.tans_init_custom_ar_ops.restype = ct.c_int
_lib.tans_init_custom_ar_ops.argtypes = [ct.c_void_p, _f32p, _f32p, ct.c_int64, ct.c_int]
_lib.tans_encode_with_indexes.restype = ct.c_int64
_lib.tans_encode_with_indexes.argtypes = [
    ct.c_void_p, _i32p, _i32p, ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_int, ct.c_int]
_lib.tans_flush.restype = ct.c_int64
_lib.tans_flush.argtypes = [ct.c_void_p]
_lib.tans_copy_output.argtypes = [ct.c_void_p, _u8p]
_lib.tans_decode_with_indexes.restype = ct.c_int64
_lib.tans_decode_with_indexes.argtypes = [
    ct.c_void_p, _u8p, ct.c_int64, _i32p, ct.c_int64, ct.c_void_p, ct.c_void_p,
    ct.c_int, _i32p]
_lib.tans_set_stream.restype = ct.c_int
_lib.tans_set_stream.argtypes = [ct.c_void_p, _u8p, ct.c_int64]
_lib.tans_decode_stream.restype = ct.c_int64
_lib.tans_decode_stream.argtypes = [
    ct.c_void_p, _i32p, ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_int, _i32p]

FSE_DEFAULT_TABLELOG = 11


class _TansBase:
    _is_encoder = False

    def __init__(self, table_log: int = FSE_DEFAULT_TABLELOG,
                 max_symbol_value: int = 255, bypass_coding: bool = False,
                 bypass_precision: int = 4):
        self._h = _lib.tans_ctx_new(table_log, max_symbol_value,
                                    int(bypass_coding), bypass_precision)
        self.table_log = table_log
        self.max_symbol_value = max_symbol_value
        self.bypass_coding = bypass_coding

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            _lib.tans_ctx_free(h)
            self._h = None

    def _check(self, rc):
        if rc < 0:
            raise ValueError(_lib.tans_last_error(self._h).decode())
        return rc

    def init_params(self, freqs, num_symbols, offsets):
        freqs = _as_i32(freqs)
        if freqs.ndim != 2:
            raise ValueError("freqs must be 2D")
        self._check(_lib.tans_init_params(
            self._h, freqs, freqs.shape[1], _as_i32(num_symbols).ravel(),
            _as_i32(offsets).ravel(), freqs.shape[0],
            int(self._is_encoder), int(not self._is_encoder)))

    def init_ar_params(self, ar_tables, ar_offsets=None):
        tab = _as_i32(ar_tables)
        order = tab.ndim - 2
        if order == 1:
            nt, dd, d1 = tab.shape
            d2 = 1
        elif order == 2:
            nt, dd, d1, d2 = tab.shape
        else:
            raise ValueError("ar_tables must be 3D or 4D")
        self._check(_lib.tans_init_ar_params(
            self._h, np.ascontiguousarray(tab.ravel()), nt, dd, d1, d2, order))
        self._ar_order = order

    def init_custom_ar_ops(self, ops):
        if not ops:
            return
        order = len(ops[0][0])
        weights = np.ascontiguousarray([list(o[0]) for o in ops], dtype=np.float32)
        params = np.ascontiguousarray([[o[1], o[2], o[3], o[4]] for o in ops],
                                      dtype=np.float32)
        self._check(_lib.tans_init_custom_ar_ops(self._h, weights, params,
                                                 len(ops), order))

    def _ar_args(self, ar_indexes, ar_offsets, n):
        if ar_offsets is None:
            return None, None, 0
        ar_off = _as_i32(ar_offsets)
        order = ar_off.shape[0]
        ar_off = np.ascontiguousarray(ar_off.reshape(order, -1))
        ar_idx = None
        if ar_indexes is not None:
            ar_idx = np.ascontiguousarray(_as_i32(ar_indexes).ravel())
        return ar_idx, ar_off, order


class TansEncoder(_TansBase):
    _is_encoder = True

    def encode_with_indexes(self, symbols, indexes, ar_indexes=None,
                            ar_offsets=None, cache: bool = False) -> bytes:
        sym = np.ascontiguousarray(_as_i32(symbols).ravel())
        idx = np.ascontiguousarray(_as_i32(indexes).ravel())
        n = idx.size
        ar_idx, ar_off, order = self._ar_args(ar_indexes, ar_offsets, n)
        nbytes = self._check(_lib.tans_encode_with_indexes(
            self._h, sym, idx, n,
            ar_idx.ctypes.data if ar_idx is not None else None,
            ar_off.ctypes.data if ar_off is not None else None,
            order, int(cache)))
        if cache:
            return b""
        out = np.empty(nbytes, dtype=np.uint8)
        _lib.tans_copy_output(self._h, out)
        return out.tobytes()

    def flush(self) -> bytes:
        nbytes = self._check(_lib.tans_flush(self._h))
        out = np.empty(nbytes, dtype=np.uint8)
        _lib.tans_copy_output(self._h, out)
        return out.tobytes()


class TansDecoder(_TansBase):
    _is_encoder = False

    def decode_with_indexes(self, encoded: bytes, indexes, ar_indexes=None,
                            ar_offsets=None) -> np.ndarray:
        idx = _as_i32(indexes)
        flat = np.ascontiguousarray(idx.ravel())
        n = flat.size
        ar_idx, ar_off, order = self._ar_args(ar_indexes, ar_offsets, n)
        out = np.empty(n, dtype=np.int32)
        stream = np.frombuffer(encoded, dtype=np.uint8)
        self._check(_lib.tans_decode_with_indexes(
            self._h, stream, stream.size, flat, n,
            ar_idx.ctypes.data if ar_idx is not None else None,
            ar_off.ctypes.data if ar_off is not None else None,
            order, out))
        return out.reshape(idx.shape)

    def set_stream(self, stream: bytes):
        buf = np.frombuffer(stream, dtype=np.uint8)
        self._check(_lib.tans_set_stream(self._h, buf, buf.size))

    def decode_stream(self, indexes, ar_indexes=None, ar_offsets=None) -> np.ndarray:
        idx = _as_i32(indexes)
        flat = np.ascontiguousarray(idx.ravel())
        n = flat.size
        ar_idx, ar_off, order = self._ar_args(ar_indexes, ar_offsets, n)
        out = np.empty(n, dtype=np.int32)
        self._check(_lib.tans_decode_stream(
            self._h, flat, n,
            ar_idx.ctypes.data if ar_idx is not None else None,
            ar_off.ctypes.data if ar_off is not None else None,
            order, out))
        return out.reshape(idx.shape)
