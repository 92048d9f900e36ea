"""On-device (TPU) interleaved rANS decoding.

The TPU-native entropy-coding mode: the host C++ encoder
(rans_encode_interleaved) splits symbols round-robin over L independent
rANS64 lanes; this module decodes ALL lanes in parallel inside one XLA
program using vectorized gathers — so an entire autoregressive latent
decode (context convs + symbol decode + scatter, see graph/topogroup.py)
fuses into a single device dispatch with zero per-group host round-trips.

This replaces the reference's symbol-serial C++ decode loop
(csrc/ans/rans64.cpp:434-500) as the fast path; the bit-exact host coder
remains the compatibility mode.

State math mirrors the rANS64 contract: 64-bit state, 16-bit frequency
precision, 32-bit renormalization reads, 2-word little-endian flush head.
uint64 ops are emulated with (hi32, lo32) uint32 pairs for TPU friendliness.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = 16
_LOW_HI = np.uint32(1 << 31)  # kLow = 2^63? no: kLow = 2^31 -> hi=0, lo=2^31


class DecoderTables(NamedTuple):
    """Device-resident decode tables.

    start_freq: (num_dists, max_sym) uint32 — (freq << 16) | cdf_start,
        ONE 4-byte gather instead of an 8-byte (start, freq) int32 pair.
        (Used by the encoder and the legacy gather decode path.)
    cum2sym:    (num_dists, 2^16) uint16 cumulative->symbol lookup —
        legacy gather decode path only.
    offsets:    (num_dists,) int32 symbol offsets
    sizes:      (num_dists,) int32 row sizes
    cdf_hi/lo:  (num_dists, max_size) float32 byte-split cdf rows (hi*256 +
        lo == cdf value; pads hold 2^16, never <= a 16-bit cum). The
        GATHER-FREE decode resolution: TPU has no vector gather (XLA
        lowers one to a ~25 Msym/s serial unit, measured by
        tools/probe_decode_gather.py), so the fast decode step fetches
        each lane's whole cdf row with one one-hot MXU matmul and resolves
        cum -> (sym, start, freq) with vector compares/reductions. The
        byte split keeps the matmul EXACT even at bf16 precision (one-hot
        products are 1.0 * v with v <= 255; accumulation is f32).
    """
    start_freq: jnp.ndarray
    cum2sym: jnp.ndarray
    offsets: jnp.ndarray
    sizes: jnp.ndarray
    cdf_hi: jnp.ndarray
    cdf_lo: jnp.ndarray
    # Hierarchical (two-stage) tables for WIDE rows: coarse = every
    # stride-th cdf entry ((D, NB)); fine = the per-bucket windows laid
    # out (D, NB*(stride+1)). stride is derived from the shapes:
    # stride = fine.shape[1] // coarse.shape[1] - 1.
    cdf_c_hi: jnp.ndarray
    cdf_c_lo: jnp.ndarray
    cdf_f_hi: jnp.ndarray
    cdf_f_lo: jnp.ndarray


def build_decoder_tables(cdfs: np.ndarray, sizes: np.ndarray,
                         offsets: np.ndarray) -> DecoderTables:
    cdfs = np.asarray(cdfs, np.int32)
    sizes = np.asarray(sizes, np.int32)
    num_dists = cdfs.shape[0]
    c2s = np.zeros((num_dists, 1 << PRECISION), np.uint16)
    max_sym = int(sizes.max()) - 1
    sf = np.zeros((num_dists, max_sym), np.uint32)
    cdf_pad = np.full((num_dists, max_sym + 1), 1 << PRECISION, np.int64)
    for d in range(num_dists):
        row = cdfs[d, : sizes[d]]
        # cum2sym[c] = s for cdf[s] <= c < cdf[s+1]
        c2s[d] = (np.searchsorted(row, np.arange(1 << PRECISION),
                                  side="right") - 1).astype(np.uint16)
        start = row[:-1].astype(np.uint32)
        freq = np.diff(row).astype(np.uint32)
        sf[d, : sizes[d] - 1] = (freq << 16) | start
        cdf_pad[d, : sizes[d]] = row
    width = max_sym + 1
    # hierarchical split: smallest power-of-two stride with <= 512 buckets
    stride = 1
    while -(-width // stride) > 512:
        stride *= 2
    nb = -(-width // stride)
    cols = np.minimum(np.arange(nb)[:, None] * stride
                      + np.arange(stride + 1), width - 1)      # (NB, S+1)
    fine = cdf_pad[:, cols.reshape(-1)]                        # (D, NB*(S+1))
    coarse = cdf_pad[:, np.minimum(np.arange(nb) * stride, width - 1)]
    f32 = np.float32
    return DecoderTables(jnp.asarray(sf), jnp.asarray(c2s),
                         jnp.asarray(np.asarray(offsets, np.int32)),
                         jnp.asarray(sizes),
                         jnp.asarray((cdf_pad >> 8).astype(f32)),
                         jnp.asarray((cdf_pad & 0xFF).astype(f32)),
                         jnp.asarray((coarse >> 8).astype(f32)),
                         jnp.asarray((coarse & 0xFF).astype(f32)),
                         jnp.asarray((fine >> 8).astype(f32)),
                         jnp.asarray((fine & 0xFF).astype(f32)))


class LaneState(NamedTuple):
    """Per-lane rANS state as uint32 pairs + stream read pointers."""
    hi: jnp.ndarray   # (L,) uint32 — state >> 32
    lo: jnp.ndarray   # (L,) uint32 — state & 0xffffffff
    ptr: jnp.ndarray  # (L,) int32 — next word index within the lane stream


class LaneState32(NamedTuple):
    """Per-lane state of the rans32 lane format (v2): one uint32 state per
    lane (16-bit renorm words) + stream read pointers. The per-step update
    is pure uint32 arithmetic — no 64-bit emulation on the VPU."""
    x: jnp.ndarray    # (L,) uint32
    ptr: jnp.ndarray  # (L,) int32


def init_lane_states(lane_words: jnp.ndarray):
    """lane_words (L, max_words): uint32 -> rANS64 lanes (head = lo, hi
    flush words); uint16 -> rans32 lanes (head = lo16, hi16)."""
    if lane_words.dtype == jnp.uint16:
        lo = lane_words[:, 0].astype(jnp.uint32)
        hi = lane_words[:, 1].astype(jnp.uint32)
        ptr = jnp.full((lane_words.shape[0],), 2, jnp.int32)
        return LaneState32(lo | (hi << 16), ptr)
    lo = lane_words[:, 0]
    hi = lane_words[:, 1]
    ptr = jnp.full((lane_words.shape[0],), 2, jnp.int32)
    return LaneState(hi, lo, ptr)


def decode_step(state: LaneState, lane_words: jnp.ndarray,
                indexes: jnp.ndarray, mask: jnp.ndarray,
                tables: DecoderTables) -> Tuple[jnp.ndarray, LaneState]:
    """Decode one symbol on every active lane.

    indexes: (L,) int32 distribution per lane; mask: (L,) bool active lanes.
    Returns (symbols (L,) int32 incl. offsets, new state).

    Per-lane math (64-bit state x as (hi,lo)):
      cum  = lo & 0xffff
      s    = cum2sym[idx, cum]
      x    = freq * (x >> 16) + cum - start
      if x < 2^31: x = (x << 32) | next_word ; ptr += 1
    """
    hi, lo, ptr = state
    cum = lo & jnp.uint32(0xFFFF)

    idx = indexes.astype(jnp.int32)
    sym = tables.cum2sym[idx, cum.astype(jnp.int32)].astype(jnp.int32)
    sf = tables.start_freq[idx, sym]  # one packed (freq<<16)|start gather
    start = sf & jnp.uint32(0xFFFF)
    freq = sf >> 16

    # x >> 16 on (hi, lo):
    shr_lo = (lo >> 16) | (hi << 16)
    shr_hi = hi >> 16
    # multiply (shr_hi, shr_lo) by freq (freq < 2^16, result < 2^64):
    # lo32 split for exact 32x16 products.
    m_ll = (shr_lo & jnp.uint32(0xFFFF)) * freq
    m_lh = (shr_lo >> 16) * freq
    prod_lo = m_ll + ((m_lh & jnp.uint32(0xFFFF)) << 16)
    carry = (prod_lo < m_ll).astype(jnp.uint32)
    prod_hi = shr_hi * freq + (m_lh >> 16) + carry
    # + cum - start (fits in 32 bits, may borrow):
    add = cum - start  # uint32 wraparound if negative
    new_lo = prod_lo + add
    # detect negative add (cum < start) and carry:
    neg = (cum < start).astype(jnp.uint32)
    carry2 = ((new_lo < prod_lo) & (neg == 0)).astype(jnp.uint32)
    borrow = ((new_lo > prod_lo) & (neg == 1)).astype(jnp.uint32)
    new_hi = prod_hi + carry2 - borrow

    # renormalize: if x < 2^31 (hi==0 and lo < 2^31) read one word.
    need = (new_hi == 0) & (new_lo < _LOW_HI)
    word = lane_words[jnp.arange(lane_words.shape[0]), ptr]
    # x = (x << 32) | word  ->  hi = lo, lo = word
    rn_hi = jnp.where(need, new_lo, new_hi)
    rn_lo = jnp.where(need, word, new_lo)
    rn_ptr = ptr + (need & mask).astype(jnp.int32)

    # masked lanes keep their state
    out_hi = jnp.where(mask, rn_hi, hi)
    out_lo = jnp.where(mask, rn_lo, lo)
    symbols = (sym + tables.offsets[idx]).astype(jnp.int32)
    return symbols, LaneState(out_hi, out_lo, rn_ptr)


_ONEHOT = os.environ.get("CBT_DECODE_ONEHOT", "1") != "0"
# The one-hot resolution's VPU cost scales with the padded table WIDTH
# (L x max_size reductions per step): measured on the v5e it beats the
# serial-unit gathers up to a few hundred columns (z factorized tables,
# 279 wide: win; y scale tables, 3389 wide: loss — the widest Gaussian
# rows dominate every lane's reduction). Width-gate the fast path.
_ONEHOT_MAX_WIDTH = int(os.environ.get("CBT_ONEHOT_MAX_WIDTH", "768"))
# Hierarchical two-stage resolution for wide rows: implemented and
# bit-exact, but MEASURED SLOWER than the two gathers it replaces on the
# v5e (13.2 vs 16.4 Msym/s at 2048 lanes on 3390-wide tables — the extra
# per-step ops cost more scan latency than the serial gathers; see
# docs/performance.md round 5). Default OFF; kept for re-evaluation on
# hardware with different gather/matmul latency balance.
_WIDE_ONEHOT = os.environ.get("CBT_DECODE_ONEHOT_WIDE", "0") != "0"


def _use_onehot(tables: DecoderTables) -> bool:
    return _ONEHOT and tables.cdf_hi.shape[1] <= _ONEHOT_MAX_WIDTH


def _resolve_sym_onehot(idx: jnp.ndarray, cum: jnp.ndarray,
                        tables: DecoderTables):
    """Gather-free cum -> (sym, start, freq): one one-hot MXU matmul
    fetches every lane's cdf row, vector compares/reductions resolve the
    bin. Replaces TWO serial-unit gathers (~25 Msym/s each, measured in
    tools/probe_decode_gather.py) with dense MXU/VPU work (~36 Msym/s for
    the whole resolution) — the decode scan's dominant cost.

    Exactness: cdf rows are byte-split (hi*256 + lo), so each matmul's
    nonzero products are 1.0 * v with v <= 256 — exact even if XLA runs
    the MXU at bf16 precision; accumulation is f32; all values < 2^17 are
    exact f32 integers."""
    oh = jax.nn.one_hot(idx, tables.cdf_hi.shape[0], dtype=jnp.float32)
    rows = 256.0 * (oh @ tables.cdf_hi) + (oh @ tables.cdf_lo)  # (L, S)
    c_f = cum.astype(jnp.float32)
    le = rows <= c_f[:, None]
    sym = jnp.sum(le, axis=-1).astype(jnp.int32) - 1
    start_f = jnp.max(jnp.where(le, rows, -1.0), axis=-1)
    nxt_f = jnp.min(jnp.where(le, jnp.float32(1 << PRECISION), rows),
                    axis=-1)
    start = start_f.astype(jnp.uint32)
    freq = (nxt_f - start_f).astype(jnp.uint32)
    return sym, start, freq


def _resolve_sym_onehot_wide(idx: jnp.ndarray, cum: jnp.ndarray,
                             tables: DecoderTables):
    """Hierarchical gather-free cum -> (sym, start, freq) for WIDE cdf
    rows (the flagship's y scale tables run to 3389 columns — a flat
    one-hot reduction there costs more than the gathers it replaces).
    Two narrow stages instead: resolve the stride-quantized COARSE row
    (<= 512 cols) to a bucket k, then resolve inside the (stride+1)-wide
    FINE window selected by a second masked reduction. Both fetches are
    one-hot MXU matmuls over byte-split tables — exact at bf16 — so the
    step still performs zero random accesses."""
    D = tables.cdf_c_hi.shape[0]
    NB = tables.cdf_c_hi.shape[1]
    S1 = tables.cdf_f_hi.shape[1] // NB          # stride + 1
    c_f = cum.astype(jnp.float32)
    ohd = jax.nn.one_hot(idx, D, dtype=jnp.float32)
    crows = 256.0 * (ohd @ tables.cdf_c_hi) + (ohd @ tables.cdf_c_lo)
    k = jnp.sum(crows <= c_f[:, None], axis=-1).astype(jnp.int32) - 1
    fall = (256.0 * (ohd @ tables.cdf_f_hi)
            + (ohd @ tables.cdf_f_lo)).reshape(-1, NB, S1)
    ohk = jax.nn.one_hot(k, NB, dtype=jnp.float32)
    frows = jnp.sum(fall * ohk[:, :, None], axis=1)          # (L, S1)
    le = frows <= c_f[:, None]
    off = jnp.sum(le, axis=-1).astype(jnp.int32) - 1
    sym = k * (S1 - 1) + off
    start_f = jnp.max(jnp.where(le, frows, -1.0), axis=-1)
    nxt_f = jnp.min(jnp.where(le, jnp.float32(1 << PRECISION) + 1.0,
                              frows), axis=-1)
    return (sym, start_f.astype(jnp.uint32),
            (nxt_f - start_f).astype(jnp.uint32))


def decode_step32(state: LaneState32, lane_words: jnp.ndarray,
                  indexes: jnp.ndarray, mask: jnp.ndarray,
                  tables: DecoderTables) -> Tuple[jnp.ndarray, LaneState32]:
    """Decode one symbol per active lane in the rans32 format.

    Semantics spec: rans32_decode_interleaved (coding/csrc/anscoder.cpp).
    Per lane (uint32 state x, u16 words):
      cum = x & 0xffff
      s   = cum2sym[idx, cum]                    (one-hot fast path: see
      x   = freq * (x >> 16) + cum - start        _resolve_sym_onehot)
      if x < 2^16: x = (x << 16) | next_word ; ptr += 1
    The remaining gather is the per-lane stream-word read (amortized by
    unroll); CBT_DECODE_ONEHOT=0 restores the dense-table gathers."""
    x, ptr = state
    cum = x & jnp.uint32(0xFFFF)
    idx = indexes.astype(jnp.int32)
    if _use_onehot(tables):
        sym, start, freq = _resolve_sym_onehot(idx, cum, tables)
    elif _ONEHOT and _WIDE_ONEHOT:
        sym, start, freq = _resolve_sym_onehot_wide(idx, cum, tables)
    else:
        sym = tables.cum2sym[idx, cum.astype(jnp.int32)].astype(jnp.int32)
        sf = tables.start_freq[idx, sym]
        start = sf & jnp.uint32(0xFFFF)
        freq = sf >> 16
    nx = freq * (x >> 16) + cum - start
    need = nx < jnp.uint32(1 << 16)
    word = lane_words[jnp.arange(lane_words.shape[0]), ptr].astype(jnp.uint32)
    rn_x = jnp.where(need, (nx << 16) | word, nx)
    out_x = jnp.where(mask, rn_x, x)
    rn_ptr = ptr + (need & mask).astype(jnp.int32)
    symbols = (sym + tables.offsets[idx]).astype(jnp.int32)
    return symbols, LaneState32(out_x, rn_ptr)


def _step_for(lane_words: jnp.ndarray):
    return decode_step32 if lane_words.dtype == jnp.uint16 else decode_step


def decode_flat(lane_words: jnp.ndarray, indexes_flat: jnp.ndarray,
                n: int, tables: DecoderTables) -> jnp.ndarray:
    """Decode n symbols whose distribution indexes are known up front
    (non-AR case, e.g. the factorized z node). indexes_flat: (n_padded,)
    padded to a multiple of L. Returns (n_padded,) int32 (first n valid)."""
    L = lane_words.shape[0]
    steps = indexes_flat.shape[0] // L
    state = init_lane_states(lane_words)
    step_fn = _step_for(lane_words)

    def body(s, carry):
        state, out = carry
        pos = s * L + jnp.arange(L)
        idx = jax.lax.dynamic_slice(indexes_flat, (s * L,), (L,))
        mask = pos < n
        syms, state = step_fn(state, lane_words, idx, mask, tables)
        out = jax.lax.dynamic_update_slice(out, syms, (s * L,))
        return state, out

    out = jnp.zeros_like(indexes_flat)
    _, out = jax.lax.fori_loop(0, steps, body, (state, out))
    return out


def decode_positions(lane_words: jnp.ndarray, positions: jnp.ndarray,
                     indexes_flat: jnp.ndarray, state: LaneState,
                     tables: DecoderTables, out_flat: jnp.ndarray,
                     means_flat: jnp.ndarray):
    """Decode len(positions) symbols (length a multiple of L) whose flat
    target positions are given. Padding convention: position sequences are
    padded by REPEATING the last real position — the encoder encodes the
    duplicate symbol again, so decode/scatter of duplicates is idempotent
    and encoder/decoder distribution indexes always agree.

    Gaussian-dequantizes with means_flat and scatters into out_flat.
    Returns (out_flat, state).

    Implementation: lax.scan collects per-step value rows and ONE scatter
    runs at the end — scattering into the full latent buffer inside the
    loop would copy it every iteration (HBM-bound).

    The per-step distribution indexes and Gaussian means depend only on
    `positions` (static scan inputs), NOT on decoded state — so they are
    PRE-GATHERED as (steps, L) matrices outside the loop: two big gathers
    XLA lowers efficiently, instead of 2x`steps` latency-bound small ones
    inside the sequential scan (the scan's per-step cost is dominated by
    fixed per-op overhead, not element count)."""
    L = lane_words.shape[0]
    steps = positions.shape[0] // L
    all_on = jnp.ones((L,), bool)
    step_fn = _step_for(lane_words)

    pos_rows = positions.reshape(steps, L)
    idx_rows = jnp.take(indexes_flat, pos_rows)
    mean_rows = jnp.take(means_flat, pos_rows)
    vals, state = decode_rows(lane_words, idx_rows, mean_rows, state,
                              tables)
    out_flat = out_flat.at[positions].set(vals.reshape(-1))
    return out_flat, state


def decode_rows(lane_words: jnp.ndarray, idx_rows: jnp.ndarray,
                mean_rows: jnp.ndarray, state, tables: DecoderTables):
    """The bare decode scan: rows of per-step (indexes, means) in stream
    order, NO position gathers or scatters. Returns (vals (steps, L),
    state). The slice-layout coding path (fixed topogroup patterns) feeds
    this from strided-slice extractions — position gathers/scatters are
    serial-unit ops on TPU (~29 M elem/s measured,
    tools/probe_decode_gather.py) and dominated the fused decode before
    this split; slices run at memory bandwidth."""
    step_fn = _step_for(lane_words)
    L = lane_words.shape[0]
    all_on = jnp.ones((L,), bool)

    def body(state, xs):
        idx, mean = xs
        syms, state = step_fn(state, lane_words, idx, all_on, tables)
        vals = syms.astype(jnp.float32) + mean
        return state, vals

    # unroll: fewer scan iterations -> less loop bookkeeping between the
    # latency-bound small-vector steps (the chain itself stays sequential).
    unroll = int(os.environ.get("CBT_DECODE_UNROLL", "4"))
    state, vals = jax.lax.scan(body, state, (idx_rows, mean_rows),
                               unroll=unroll)
    return vals, state


def encode_flat32(symbols_flat: jnp.ndarray, indexes_flat: jnp.ndarray,
                  n, tables: DecoderTables, num_lanes: int):
    """On-device (TPU) interleaved rans32 ENCODE — one XLA program.

    Mirrors rans32_encode_interleaved (coding/csrc/anscoder.cpp:735) word
    for word: same lane assignment (symbol i rides lane i % L), same
    state math, same flush — so the produced lane streams are
    BYTE-IDENTICAL to the host C++ encoder's and every existing decoder
    (host or device) reads them. The point is the tunnel/PCIe bill: the
    host pulls ~compressed-size bytes instead of the full int16 symbol +
    uint8 index tensors (5-7x smaller at typical rates).

    symbols_flat/indexes_flat: (K*L,) int32, symbols in stream order,
    padded arbitrarily past n (padding never touches the state).
    n: number of real symbols (python int or traced scalar).
    Returns (body (K*L + 2L,) uint16, counts (L,) int32, total int32,
    ok bool). body holds each lane's stream (2 flush words + renorm
    words) concatenated at exclusive-cumsum(counts) offsets — exactly
    the pack_lane_words marker-1 sparse payload. ok=False when any
    active symbol falls outside its distribution's table range (no
    bypass in interleaved mode — caller falls back to the host path,
    same contract as the C++ encoder's error return).
    """
    L = num_lanes
    K = symbols_flat.shape[0] // L
    lanes = jnp.arange(L)

    def body_fn(carry, k):
        state, ok = carry
        i = k * L + lanes
        active = i < n
        sym = jax.lax.dynamic_slice(symbols_flat, (k * L,), (L,))
        idx = jax.lax.dynamic_slice(indexes_flat, (k * L,), (L,))
        value = sym - tables.offsets[idx]
        in_range = (value >= 0) & (value < tables.sizes[idx] - 1)
        ok = ok & jnp.all(in_range | ~active)
        value = jnp.clip(value, 0, tables.start_freq.shape[1] - 1)
        sf = tables.start_freq[idx, value]
        start = sf & jnp.uint32(0xFFFF)
        # freq=0 only on clamped/out-of-range entries (ok already False):
        # keep the division defined.
        freq = jnp.maximum(sf >> 16, jnp.uint32(1))
        # renorm: emit the low 16 bits iff state >= freq << 16 (compare
        # shifted to dodge the freq == 2^16 uint32 overflow).
        emit = ((state >> 16) >= freq) & active
        word = (state & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        st = jnp.where(emit, state >> 16, state)
        q = st // freq
        r = st - q * freq
        state = jnp.where(active, (q << 16) + r + start, state)
        return (state, ok), (word, emit)

    init = (jnp.full((L,), jnp.uint32(1 << 16)),  # kLow32
            jnp.asarray(True))
    # rANS encodes in reverse symbol order: scan k = K-1 .. 0.
    (state, ok), (words, emits) = jax.lax.scan(
        body_fn, init, jnp.arange(K - 1, -1, -1))
    # The C++ encoder prepends as k descends, so the final lane stream
    # carries renorm words in ASCENDING k order after the flush head.
    words = words[::-1]
    emits = emits[::-1]
    body_counts = jnp.sum(emits, axis=0, dtype=jnp.int32)
    counts = body_counts + 2  # (lo, hi) flush head per lane
    lane_base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(counts)[:-1]])
    # each emitted word's slot inside its lane: 2 + #emits at smaller k
    within = 2 + jnp.cumsum(emits, axis=0, dtype=jnp.int32) - emits
    out = jnp.zeros((symbols_flat.shape[0] + 2 * L,), jnp.uint16)
    flat_pos = jnp.where(emits, lane_base[None, :] + within, out.shape[0])
    out = out.at[flat_pos.reshape(-1)].set(words.reshape(-1), mode="drop")
    out = out.at[lane_base].set((state & jnp.uint32(0xFFFF))
                                .astype(jnp.uint16))
    out = out.at[lane_base + 1].set((state >> 16).astype(jnp.uint16))
    return out, counts, jnp.sum(counts), ok


def pad_positions(mask: np.ndarray, num_lanes: int) -> np.ndarray:
    """Pad a group's flat position array to a multiple of num_lanes by
    repeating the last position (see decode_positions)."""
    pad = (-len(mask)) % num_lanes
    if pad == 0:
        return np.asarray(mask, np.int32)
    return np.concatenate([mask, np.full(pad, mask[-1], np.int32)])
