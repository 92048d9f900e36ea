"""rANS64 entropy coder — ctypes binding over the native backend.

Public surface mirrors the reference coder module ``cbench.ans``
(`Rans64Encoder`/`Rans64Decoder` with ``init_params`` / ``init_cdf_params`` /
``init_ar_params`` / ``init_custom_ar_ops`` / ``encode_with_indexes`` /
``decode_with_indexes`` / ``set_stream`` / ``decode_stream`` / ``flush``;
see reference cbench/csrc/ans/rans64.hpp:127-149) so all higher layers are
drop-in compatible, but the implementation is the fresh C++ backend in
``csrc/anscoder.cpp`` bound through ctypes.
"""

from __future__ import annotations

import ctypes as ct

import numpy as np

from ._build import build_library

_lib = ct.CDLL(str(build_library("anscoder", ["anscoder.cpp", "tanscoder.cpp"])))

_lib.rans_ctx_new.restype = ct.c_void_p
_lib.rans_ctx_new.argtypes = [ct.c_uint, ct.c_int, ct.c_uint]
_lib.rans_ctx_free.argtypes = [ct.c_void_p]
_lib.rans_last_error.restype = ct.c_char_p
_lib.rans_last_error.argtypes = [ct.c_void_p]

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")

_lib.rans_pmf_to_quantized_cdf.restype = ct.c_int
_lib.rans_pmf_to_quantized_cdf.argtypes = [_f32p, ct.c_int64, ct.c_int, _i32p]

_lib.rans_init_params.restype = ct.c_int
_lib.rans_init_params.argtypes = [ct.c_void_p, _i32p, ct.c_int64, _i32p, _i32p, ct.c_int64]

_lib.rans_init_cdf_params.restype = ct.c_int
_lib.rans_init_cdf_params.argtypes = [ct.c_void_p, _i32p, ct.c_int64, _i32p, _i32p, ct.c_int64]

_lib.rans_init_ar_params.restype = ct.c_int
_lib.rans_init_ar_params.argtypes = [
    ct.c_void_p, _i32p, ct.c_int64, ct.c_int64, ct.c_int64, ct.c_int64, ct.c_int]

_lib.rans_init_custom_ar_ops.restype = ct.c_int
_lib.rans_init_custom_ar_ops.argtypes = [ct.c_void_p, _f32p, _f32p, ct.c_int64, ct.c_int]

_lib.rans_get_cdfs.restype = ct.c_int64
_lib.rans_get_cdfs.argtypes = [ct.c_void_p, _i32p, ct.c_int64]
_lib.rans_num_dists.restype = ct.c_int64
_lib.rans_num_dists.argtypes = [ct.c_void_p]

_lib.rans_encode_with_indexes.restype = ct.c_int64
_lib.rans_encode_with_indexes.argtypes = [
    ct.c_void_p, _i32p, _i32p, ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_int, ct.c_int]

_lib.rans_flush.restype = ct.c_int64
_lib.rans_flush.argtypes = [ct.c_void_p]
_lib.rans_peek_cache_size.restype = ct.c_int64
_lib.rans_peek_cache_size.argtypes = [ct.c_void_p]
_lib.rans_peek_cache.argtypes = [ct.c_void_p, _i32p]
_lib.rans_copy_output.argtypes = [ct.c_void_p, _u8p]

_lib.rans_decode_with_indexes.restype = ct.c_int64
_lib.rans_decode_with_indexes.argtypes = [
    ct.c_void_p, _u8p, ct.c_int64, _i32p, ct.c_int64, ct.c_void_p, ct.c_void_p,
    ct.c_int, _i32p]

_lib.rans_set_stream.restype = ct.c_int
_lib.rans_set_stream.argtypes = [ct.c_void_p, _u8p, ct.c_int64]

_lib.rans_decode_stream.restype = ct.c_int64
_lib.rans_decode_stream.argtypes = [
    ct.c_void_p, _i32p, ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_int, _i32p]


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> list[int]:
    """Quantize a float PMF into an integer CDF summing to 2**precision."""
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    out = np.empty(pmf.size + 1, dtype=np.int32)
    rc = _lib.rans_pmf_to_quantized_cdf(pmf, pmf.size, precision, out)
    if rc != 0:
        raise ValueError("degenerate pmf")
    return out.tolist()


class _RansBase:
    def __init__(self, freq_precision: int = 16, bypass_coding: bool = True,
                 bypass_precision: int = 4):
        self._h = _lib.rans_ctx_new(freq_precision, int(bypass_coding), bypass_precision)
        self.freq_precision = freq_precision
        self.bypass_coding = bypass_coding
        self.bypass_precision = bypass_precision
        self._ar_order = 0

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            _lib.rans_ctx_free(h)
            self._h = None

    def _check(self, rc):
        if rc < 0:
            raise ValueError(_lib.rans_last_error(self._h).decode())
        return rc

    def init_params(self, freqs, num_symbols, offsets):
        freqs = _as_i32(freqs)
        if freqs.ndim != 2:
            raise ValueError("freqs must be 2D (num_dists, max_symbols)")
        n = freqs.shape[0]
        self._check(_lib.rans_init_params(
            self._h, freqs, freqs.shape[1], _as_i32(num_symbols).ravel(),
            _as_i32(offsets).ravel(), n))

    def init_cdf_params(self, cdfs, cdfs_sizes, offsets):
        cdfs = _as_i32(cdfs)
        if cdfs.ndim != 2:
            raise ValueError("cdfs must be 2D (num_dists, max_size)")
        self._check(_lib.rans_init_cdf_params(
            self._h, cdfs, cdfs.shape[1], _as_i32(cdfs_sizes).ravel(),
            _as_i32(offsets).ravel(), cdfs.shape[0]))

    def init_ar_params(self, ar_tables, ar_offsets=None):
        """AR lookup tables, shape (num_tables, dist_dim, d1[, d2]).

        ``ar_offsets`` (per-table dim offsets) is accepted for API parity;
        the spatial offsets actually used at coding time are the per-element
        offsets passed to encode/decode (see utils ``create_ar_offsets``).
        """
        tab = _as_i32(ar_tables)
        order = tab.ndim - 2
        if order == 1:
            nt, dd, d1 = tab.shape
            d2 = 1
        elif order == 2:
            nt, dd, d1, d2 = tab.shape
        else:
            raise ValueError("ar_tables must be 3D or 4D")
        self._check(_lib.rans_init_ar_params(self._h, np.ascontiguousarray(tab.ravel()),
                                             nt, dd, d1, d2, order))
        self._ar_order = order

    def init_custom_ar_ops(self, ops):
        """ops: list of (weights, bias, scale, min, max) tuples."""
        if not ops:
            return
        order = len(ops[0][0])
        weights = np.ascontiguousarray(
            [list(o[0]) for o in ops], dtype=np.float32)
        params = np.ascontiguousarray(
            [[o[1], o[2], o[3], o[4]] for o in ops], dtype=np.float32)
        self._check(_lib.rans_init_custom_ar_ops(self._h, weights, params, len(ops), order))
        self._ar_order = order

    def get_cdfs(self) -> np.ndarray:
        nd = _lib.rans_num_dists(self._h)
        if nd == 0:
            return np.zeros((0, 0), dtype=np.int32)
        # Two-phase: query size then fetch.
        probe = np.zeros(1, dtype=np.int32)
        need = _lib.rans_get_cdfs(self._h, probe, 0)
        total = -need if need < 0 else need * nd
        out = np.zeros(int(total), dtype=np.int32)
        max_sz = _lib.rans_get_cdfs(self._h, out, out.size)
        return out.reshape(nd, int(max_sz))

    def _ar_args(self, ar_indexes, ar_offsets, n):
        if ar_offsets is None:
            return None, None, 0
        ar_off = _as_i32(ar_offsets)
        order = ar_off.shape[0]
        ar_off = np.ascontiguousarray(ar_off.reshape(order, -1))
        if ar_off.shape[1] != n:
            raise ValueError("ar_offsets must have shape (order, *data_shape)")
        ar_idx = None
        if ar_indexes is not None:
            ar_idx = np.ascontiguousarray(_as_i32(ar_indexes).ravel())
        return ar_idx, ar_off, order


class Rans64Encoder(_RansBase):
    def encode_with_indexes(self, symbols, indexes, ar_indexes=None, ar_offsets=None,
                            cache: bool = False) -> bytes:
        sym = np.ascontiguousarray(_as_i32(symbols).ravel())
        idx = np.ascontiguousarray(_as_i32(indexes).ravel())
        n = idx.size
        ar_idx, ar_off, order = self._ar_args(ar_indexes, ar_offsets, n)
        nbytes = self._check(_lib.rans_encode_with_indexes(
            self._h, sym, idx, n,
            ar_idx.ctypes.data if ar_idx is not None else None,
            ar_off.ctypes.data if ar_off is not None else None,
            order, int(cache)))
        if cache:
            return b""
        out = np.empty(nbytes, dtype=np.uint8)
        _lib.rans_copy_output(self._h, out)
        return out.tobytes()

    def flush(self) -> bytes:
        nbytes = self._check(_lib.rans_flush(self._h))
        out = np.empty(nbytes, dtype=np.uint8)
        _lib.rans_copy_output(self._h, out)
        return out.tobytes()

    def peek_cache(self) -> np.ndarray:
        n = _lib.rans_peek_cache_size(self._h)
        out = np.zeros((int(n), 3), dtype=np.int32)
        if n:
            _lib.rans_peek_cache(self._h, out)
        return out


class Rans64Decoder(_RansBase):
    def decode_with_indexes(self, encoded: bytes, indexes, ar_indexes=None,
                            ar_offsets=None) -> np.ndarray:
        idx = _as_i32(indexes)
        flat = np.ascontiguousarray(idx.ravel())
        n = flat.size
        ar_idx, ar_off, order = self._ar_args(ar_indexes, ar_offsets, n)
        out = np.empty(n, dtype=np.int32)
        stream = np.frombuffer(encoded, dtype=np.uint8)
        self._check(_lib.rans_decode_with_indexes(
            self._h, stream, stream.size, flat, n,
            ar_idx.ctypes.data if ar_idx is not None else None,
            ar_off.ctypes.data if ar_off is not None else None,
            order, out))
        return out.reshape(idx.shape)

    def set_stream(self, stream: bytes):
        buf = np.frombuffer(stream, dtype=np.uint8)
        _lib.rans_set_stream(self._h, buf, buf.size)

    def decode_stream(self, indexes, ar_indexes=None, ar_offsets=None) -> np.ndarray:
        idx = _as_i32(indexes)
        flat = np.ascontiguousarray(idx.ravel())
        n = flat.size
        ar_idx, ar_off, order = self._ar_args(ar_indexes, ar_offsets, n)
        out = np.empty(n, dtype=np.int32)
        self._check(_lib.rans_decode_stream(
            self._h, flat, n,
            ar_idx.ctypes.data if ar_idx is not None else None,
            ar_off.ctypes.data if ar_off is not None else None,
            order, out))
        return out.reshape(idx.shape)


# -- interleaved-lane (TPU-native) mode --------------------------------------
_u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(dtype=np.uint16, flags="C_CONTIGUOUS")
_lib.rans_encode_interleaved.restype = ct.c_int64
_lib.rans_encode_interleaved.argtypes = [
    ct.c_void_p, _i32p, _i32p, ct.c_int64, ct.c_int64, _u32p, ct.c_int64, _i32p]
_lib.rans_decode_interleaved.restype = ct.c_int64
_lib.rans_decode_interleaved.argtypes = [
    ct.c_void_p, _u32p, ct.c_int64, _i32p, ct.c_int64, ct.c_int64, _i32p]
_lib.rans32_encode_interleaved.restype = ct.c_int64
_lib.rans32_encode_interleaved.argtypes = [
    ct.c_void_p, _i32p, _i32p, ct.c_int64, ct.c_int64, _u16p, ct.c_int64, _i32p]
_lib.rans32_decode_interleaved.restype = ct.c_int64
_lib.rans32_decode_interleaved.argtypes = [
    ct.c_void_p, _u16p, ct.c_int64, _i32p, ct.c_int64, ct.c_int64, _i32p]


class InterleavedRansEncoder(_RansBase):
    """Lane-interleaved rANS encoder (bypass-free) for the on-device
    decoder (ops/rans_device.py). Lane l owns symbol positions p with
    p % num_lanes == l; each lane is an independent rANS64 stream."""

    def __init__(self, freq_precision: int = 16):
        super().__init__(freq_precision, bypass_coding=False)

    def encode(self, symbols, indexes, num_lanes: int):
        """Returns (lane_words (L, max_words) uint32, lane_counts (L,) i32).
        Raises ValueError if any symbol falls outside its table range."""
        sym = np.ascontiguousarray(_as_i32(symbols).ravel())
        idx = np.ascontiguousarray(_as_i32(indexes).ravel())
        n = idx.size
        stride = (n + num_lanes - 1) // num_lanes + 8
        lane_words = np.zeros((num_lanes, stride), np.uint32)
        lane_counts = np.zeros(num_lanes, np.int32)
        max_words = self._check(_lib.rans_encode_interleaved(
            self._h, sym, idx, n, num_lanes, lane_words, stride, lane_counts))
        return np.ascontiguousarray(lane_words[:, :max_words]), lane_counts

    def decode_host(self, lane_words, indexes):
        """Host reference decode of the interleaved format (for tests)."""
        lane_words = np.ascontiguousarray(lane_words, np.uint32)
        idx = np.ascontiguousarray(_as_i32(indexes).ravel())
        out = np.empty(idx.size, np.int32)
        self._check(_lib.rans_decode_interleaved(
            self._h, lane_words, lane_words.shape[1], idx, idx.size,
            lane_words.shape[0], out))
        return out


class InterleavedRans32Encoder(_RansBase):
    """Lane-interleaved rANS with 32-bit states and 16-bit renorm words
    (lane format v2) for the on-device decoder's fast path
    (ops/rans_device.py decode_step32): the per-step update is pure uint32
    arithmetic — one 16x16 multiply + adds, no 64-bit emulation on the
    VPU — and the per-lane flush is 4 bytes instead of 8, so lane count
    can double at equal rate overhead (half the sequential decode steps).
    Same lane assignment and table semantics as InterleavedRansEncoder."""

    def __init__(self, freq_precision: int = 16):
        super().__init__(freq_precision, bypass_coding=False)

    def encode(self, symbols, indexes, num_lanes: int):
        """Returns (lane_words (L, max_words) uint16, lane_counts (L,) i32)."""
        sym = np.ascontiguousarray(_as_i32(symbols).ravel())
        idx = np.ascontiguousarray(_as_i32(indexes).ravel())
        n = idx.size
        stride = (n + num_lanes - 1) // num_lanes + 8
        lane_words = np.zeros((num_lanes, stride), np.uint16)
        lane_counts = np.zeros(num_lanes, np.int32)
        max_words = self._check(_lib.rans32_encode_interleaved(
            self._h, sym, idx, n, num_lanes, lane_words, stride, lane_counts))
        return np.ascontiguousarray(lane_words[:, :max_words]), lane_counts

    def decode_host(self, lane_words, indexes):
        """Host reference decode of the rans32 lane format (for tests)."""
        lane_words = np.ascontiguousarray(lane_words, np.uint16)
        idx = np.ascontiguousarray(_as_i32(indexes).ravel())
        out = np.empty(idx.size, np.int32)
        self._check(_lib.rans32_decode_interleaved(
            self._h, lane_words, lane_words.shape[1], idx, idx.size,
            lane_words.shape[0], out))
        return out


def pack_lane_words(lane_words: np.ndarray, lane_counts: np.ndarray) -> bytes:
    """Serialize lane streams SPARSELY: u16 num_lanes, u16 marker (0 =
    sparse u32 words; 1 = sparse u16 words, the rans32 lane format v2; the
    legacy dense format stored max_words >= 2 here), per-lane u16 counts,
    then each lane's first count words concatenated. Storing the dense
    (L, max_words) matrix padded every lane to the worst lane — with many
    lanes that padding (not content) dominated small-image streams."""
    import struct
    L, W = lane_words.shape
    counts = np.asarray(lane_counts, np.int64)
    if L >= 1 << 16:
        raise ValueError(f"too many lanes for the u16 header: {L}")
    if L and int(counts.max()) >= 1 << 16:
        # u16 per-lane counts are the SOLE source of body length in the
        # sparse layout: silently wrapping would desynchronize the stream.
        raise ValueError(
            f"lane word count {int(counts.max())} overflows the u16 sparse "
            "header; use more lanes (or the dense layout) for this payload")
    is16 = lane_words.dtype == np.uint16
    head = struct.pack("<HH", L, 1 if is16 else 0) + counts.astype("<u2").tobytes()
    body = lane_words[np.arange(W)[None, :] < counts[:, None]]
    return head + body.astype("<u2" if is16 else "<u4").tobytes()


def pack_lane_words_from_flat(lane_counts: np.ndarray, body: np.ndarray) -> bytes:
    """pack_lane_words for a payload that is ALREADY the concatenated
    per-lane u16 stream (the on-device encoder's output layout,
    ops/rans_device.encode_flat32): prepend the marker-1 sparse header.
    Byte-identical to pack_lane_words of the equivalent (L, max) matrix."""
    import struct
    counts = np.asarray(lane_counts, np.int64)
    L = counts.shape[0]
    if L >= 1 << 16:
        raise ValueError(f"too many lanes for the u16 header: {L}")
    if L and int(counts.max()) >= 1 << 16:
        raise ValueError(
            f"lane word count {int(counts.max())} overflows the u16 sparse "
            "header; use more lanes for this payload")
    body = np.ascontiguousarray(body, np.uint16)
    if body.size != int(counts.sum()):
        raise ValueError(f"body has {body.size} words, counts sum to "
                         f"{int(counts.sum())}")
    return (struct.pack("<HH", L, 1) + counts.astype("<u2").tobytes()
            + body.astype("<u2").tobytes())


def unpack_lane_words(data: bytes):
    """Inverse of pack_lane_words; also reads the legacy dense layout
    (max_words > 0) so pre-existing streams stay decodable."""
    import struct
    L, mw = struct.unpack("<HH", data[:4])
    counts = np.frombuffer(data[4:4 + 2 * L], "<u2").astype(np.int32)
    off = 4 + 2 * L
    if mw >= 2:  # legacy dense matrix (max_words; flush alone is 2 words)
        words = np.frombuffer(data[off:off + 4 * L * mw], "<u4").reshape(L, mw)
        return np.ascontiguousarray(words.astype(np.uint32)), counts
    total = int(counts.sum())
    wfmt, wsize, dtype = (("<u2", 2, np.uint16) if mw == 1
                          else ("<u4", 4, np.uint32))
    flat = np.frombuffer(data[off:off + wsize * total], wfmt)
    maxc = int(counts.max()) if L else 0
    words = np.zeros((L, maxc), dtype)
    # row-major mask fill matches the lane-by-lane concatenation order
    mask = np.arange(maxc)[None, :] < counts[:, None]
    words[mask] = flat
    return words, counts


def bucket_lane_words(lane_words: np.ndarray, min_cols: int = 32) -> np.ndarray:
    """Zero-pad the word matrix to a power-of-two column count so the
    on-device decoder sees a handful of static shapes instead of one XLA
    compilation per image."""
    L, mw = lane_words.shape
    cols = min_cols
    while cols < mw:
        cols *= 2
    if cols == mw:
        return lane_words
    out = np.zeros((L, cols), lane_words.dtype)
    out[:, :mw] = lane_words
    return out
