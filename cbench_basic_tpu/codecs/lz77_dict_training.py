"""LZ77/zstd dictionary training: iterative cover-scored segment selection.

Parity: the reference's fastcover-style trainer
(cbench/modules/preprocessor/lz77_dict_training.py:211-911):
  * d-gram frequency counting over the corpus (optionally unique-per-sample)
  * ZDICT-style sliding k-window scoring — a window scores the sum of
    global frequencies of its UNIQUE d-grams (:354-382)
  * per epoch the best-scoring window is appended to the dictionary and its
    d-grams are REMOVED from the frequency map (coverage pruning, :899-902)
  * segments are joined in reverse score order so the hottest content sits
    at the end of the dictionary where match distances are shortest (:907)
  * optional conditional epochs growing segments along the d-gram
    transition graph (:412-700, networkx path growth) — realized here as a
    greedy max-weight walk over transition counts
  * parameter search over (k, d) picking the best dict by actual
    compressed size (:913-926, dict_training_fastcover_tryparameters)

Host-side numpy throughout: frequencies via np.unique/bincount, the
unique-within-window scoring via a difference-array trick (each position i
with previous occurrence prev[i] contributes its frequency to exactly the
window-ends e in [max(i, prev[i]+W), i+W-1] — O(n) per sample per epoch,
no python inner loops), unlike the reference's per-position dict updates.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _as_bytes(sample) -> bytes:
    if isinstance(sample, (bytes, bytearray)):
        return bytes(sample)
    return np.asarray(sample, np.uint8).tobytes()


def _dgram_rows(sample: bytes, d: int) -> np.ndarray:
    arr = np.frombuffer(sample, np.uint8)
    if len(arr) < d:
        return np.zeros((0, d), np.uint8)
    return np.lib.stride_tricks.sliding_window_view(arr, d)


def _corpus_ids(samples: Sequence[bytes], d: int):
    """Global d-gram ids per sample + the unique d-gram byte rows."""
    rows = [_dgram_rows(s, d) for s in samples]
    lens = [len(r) for r in rows]
    if sum(lens) == 0:
        return [np.zeros(0, np.int64) for _ in rows], np.zeros((0, d), np.uint8)
    allrows = np.concatenate([r for r in rows if len(r)], axis=0)
    uniq, inverse = np.unique(allrows, axis=0, return_inverse=True)
    ids, pos = [], 0
    for n in lens:
        ids.append(inverse[pos:pos + n].astype(np.int64))
        pos += n
    return ids, uniq


def _prev_occurrence(ids: np.ndarray) -> np.ndarray:
    """prev[i] = last j < i with ids[j] == ids[i], else -1 (vectorized)."""
    prev = np.full(len(ids), -1, np.int64)
    order = np.argsort(ids, kind="stable")
    same = ids[order][1:] == ids[order][:-1]
    prev[order[1:][same]] = order[:-1][same]
    return prev


def _window_scores(freq_at_pos: np.ndarray, prev: np.ndarray, W: int):
    """score[e] = sum of freqs of unique d-grams in the window ENDING at e
    (start = max(e - W + 1, 0)); difference-array accumulation."""
    n = len(freq_at_pos)
    diff = np.zeros(n + 1, np.float64)
    i = np.arange(n)
    lo = np.where(prev < 0, i, np.maximum(i, prev + W))
    hi = np.minimum(i + W - 1, n - 1)
    valid = lo <= hi
    np.add.at(diff, lo[valid], freq_at_pos[valid])
    np.add.at(diff, hi[valid] + 1, -freq_at_pos[valid])
    return np.cumsum(diff[:-1])


def dict_training_fastcover(samples, dict_length: int = 32768,
                            k: int = 250, d: int = 8,
                            max_epoches: Optional[int] = None,
                            count_unique_freq: bool = False,
                            score_freq_mean: bool = False,
                            num_conditional_epoches: int = 0,
                            conditional_freq_threshold: int = 1,
                            kg: int = 8) -> bytes:
    samples = [_as_bytes(s) for s in samples]
    ids_per_sample, uniq = _corpus_ids(samples, d)
    n_uniq = len(uniq)
    if n_uniq == 0:
        return b""

    freqs = np.zeros(n_uniq, np.float64)
    for ids in ids_per_sample:
        if count_unique_freq:
            freqs[np.unique(ids)] += 1.0
        else:
            np.add.at(freqs, ids, 1.0)

    prev_per_sample = [_prev_occurrence(ids) for ids in ids_per_sample]
    W = max(k - d + 1, 1)

    segments: List[bytes] = []
    total = 0
    epoch = 0
    while total < dict_length and (max_epoches is None
                                   or epoch < max_epoches):
        best = (0.0, None)
        for si, (ids, prev) in enumerate(zip(ids_per_sample,
                                             prev_per_sample)):
            if len(ids) == 0:
                continue
            scores = _window_scores(freqs[ids], prev, W)
            if score_freq_mean:
                e = np.arange(len(ids))
                lengths = e - np.maximum(e - W + 1, 0) + d
                scores = scores / lengths
            e_best = int(np.argmax(scores))
            if scores[e_best] > best[0]:
                best = (float(scores[e_best]), (si, e_best))
        if best[1] is None or best[0] <= 0:
            break
        si, e = best[1]
        s = max(e - W + 1, 0)
        segment = samples[si][s:e + d]
        segments.append(segment)
        total += len(segment)
        # coverage pruning: drop every d-gram the segment covers
        freqs[np.unique(ids_per_sample[si][s:e + 1])] = 0.0
        epoch += 1

    if num_conditional_epoches:
        segments += _conditional_path_segments(
            samples, ids_per_sample, uniq, freqs,
            dict_length - total, num_conditional_epoches,
            conditional_freq_threshold, kg)

    # hottest (earliest-selected) content at the END = shortest distances
    out = b"".join(reversed(segments))
    if len(out) > dict_length:
        out = out[-dict_length:]
    return out


def _conditional_path_segments(samples, ids_per_sample, uniq, freqs,
                               budget: int, epochs: int, threshold: int,
                               kg: int) -> List[bytes]:
    """Greedy max-weight walks over the d-gram transition graph (the
    reference's networkx path-growth epochs, :412-700). Consecutive
    stride-1 d-grams overlap by d-1 bytes, so a path synthesizes
    first_gram + one byte per additional node."""
    n_uniq = len(uniq)
    if n_uniq == 0 or budget <= 0:
        return []
    # transition counts (cur -> next) as a sparse composite-key histogram
    keys = []
    for ids in ids_per_sample:
        if len(ids) > 1:
            keys.append(ids[:-1] * n_uniq + ids[1:])
    if not keys:
        return []
    pair_keys, pair_counts = np.unique(np.concatenate(keys),
                                       return_counts=True)
    keep = pair_counts >= threshold
    pair_keys, pair_counts = pair_keys[keep], pair_counts[keep]
    src = pair_keys // n_uniq

    segments: List[bytes] = []
    used = 0
    f = freqs.copy()
    for _ in range(epochs):
        if used >= budget or not f.any():
            break
        node = int(np.argmax(f))
        path = [node]
        f[node] = 0.0
        for _ in range(kg - 1):
            m = src == path[-1]
            if not m.any():
                break
            nxt_keys = pair_keys[m] % n_uniq
            nxt = int(nxt_keys[np.argmax(pair_counts[m]
                                         * (f[nxt_keys] > 0))])
            if f[nxt] <= 0:
                break
            path.append(nxt)
            f[nxt] = 0.0
        seg = bytes(uniq[path[0]]) + b"".join(
            bytes(uniq[p][-1:]) for p in path[1:])
        segments.append(seg)
        used += len(seg)
    return segments


def dict_training_fastcover_tryparameters(
        samples, dict_length: int = 32768,
        k_values: Sequence[int] = (64, 128, 256, 512),
        d_values: Sequence[int] = (6, 8),
        compress_fn=None, **kwargs) -> bytes:
    """(k, d) parameter sweep picking the dict with the smallest actual
    compressed corpus size (reference :913-926). compress_fn(sample, dict)
    -> bytes; defaults to the repo's LZ77 tokenizer."""
    samples = [_as_bytes(s) for s in samples]
    if compress_fn is None:
        from .lz77 import lz77_tokenize

        def compress_fn(sample, dictionary):
            return lz77_tokenize(sample, dictionary)

    best = (None, None)
    for k in k_values:
        for d in d_values:
            cand = dict_training_fastcover(samples, dict_length=dict_length,
                                           k=k, d=d, **kwargs)
            size = sum(len(compress_fn(s, cand)) for s in samples)
            if best[0] is None or size < best[0]:
                best = (size, cand)
    return best[1] if best[1] is not None else b""
