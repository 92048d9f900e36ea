#!/usr/bin/env python
"""Isolate the decode scan's per-step cost: which cum->symbol resolution
strategy is fastest on the TPU?

The fused rANS decode (ops/rans_device.py decode_step32) resolves
cum -> symbol with ONE gather into the (num_dists, 2^16) uint16 cum2sym
table — 8 MB at the flagship's 64 scale-table dists, so every step is a
random-access gather over a working set far past VMEM. The round-3 HOST
coder got 3.6x from replacing exactly this dense lookup with a binary
search over the cache-hot cdf rows (coding/csrc/anscoder.cpp); this probe
measures whether the same trade wins on the TPU VPU, plus a
reduced-precision dense table as a third option:

  a) dense16: cum2sym gather at 16-bit precision (today's fast path)
  b) bsearch: log2(max_sym) unrolled binary-search steps over the
     (num_dists, max_sym+1) int32 cdf rows (~64 KB — cache-resident)
  c) dense12: cum2sym gather at 12-bit precision (table 16x smaller;
     needs a stream-format change to land, measured here first)

Each variant runs a scan shaped exactly like the decoder's inner loop
(dependent steps, L-wide vectors), so the numbers are the per-step costs
that bound decode throughput.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lanes", type=int, default=2048)
    p.add_argument("--steps", type=int, default=432,
                   help="scan length (flagship y decode at 2048 lanes)")
    p.add_argument("--dists", type=int, default=64)
    p.add_argument("--max-sym", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    L, S, D, M = args.lanes, args.steps, args.dists, args.max_sym
    rng = np.random.default_rng(0)

    # synthetic monotone cdf rows (shape contract of the real tables)
    pmf = rng.uniform(0.5, 2.0, (D, M))
    pmf /= pmf.sum(-1, keepdims=True)

    def tables_at(prec):
        cdf = np.zeros((D, M + 1), np.int64)
        cdf[:, 1:] = np.cumsum(
            np.maximum((pmf * (1 << prec)).astype(np.int64), 1), -1)
        # clamp the last bin so cdf[-1] == 1 << prec
        cdf = np.minimum(cdf, (1 << prec))
        cdf[:, -1] = 1 << prec
        c2s = np.zeros((D, 1 << prec), np.uint16)
        for d in range(D):
            c2s[d] = (np.searchsorted(cdf[d, 1:], np.arange(1 << prec),
                                      side="right")).astype(np.uint16)
        return jnp.asarray(cdf.astype(np.int32)), jnp.asarray(c2s)

    cdf16, c2s16 = tables_at(16)
    cdf12, c2s12 = tables_at(12)

    idx = jnp.asarray(rng.integers(0, D, (S, L)), jnp.int32)
    cums16 = jnp.asarray(rng.integers(0, 1 << 16, (S, L)), jnp.uint32)
    cums12 = jnp.asarray(rng.integers(0, 1 << 12, (S, L)), jnp.uint32)

    def run_scan(step_fn, xs):
        def body(carry, x):
            sym = step_fn(x[0], carry[1] ^ x[1])  # dependent chain
            return (carry[0], sym.astype(jnp.uint32)), sym

        f = jax.jit(lambda xs: jax.lax.scan(
            body, (jnp.uint32(0), jnp.zeros((L,), jnp.uint32)), xs)[1])
        out = f(xs)  # compile
        out.block_until_ready()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            f(xs).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def dense16(d, cum):
        return c2s16[d, (cum & jnp.uint32(0xFFFF)).astype(jnp.int32)] \
            .astype(jnp.int32)

    def dense12(d, cum):
        return c2s12[d, (cum & jnp.uint32(0xFFF)).astype(jnp.int32)] \
            .astype(jnp.int32)

    nbits = int(np.ceil(np.log2(M)))

    def bsearch(d, cum):
        # unrolled binary search: find s with cdf[s] <= cum < cdf[s+1]
        c = (cum & jnp.uint32(0xFFFF)).astype(jnp.int32)
        lo = jnp.zeros_like(c)
        hi = jnp.full_like(c, M)
        for _ in range(nbits):
            mid = (lo + hi) >> 1
            v = cdf16[d, mid]
            go = v <= c
            lo = jnp.where(go, mid, lo)
            hi = jnp.where(go, hi, mid)
        return lo

    cdf16_f = cdf16.astype(jnp.float32)

    def onehot_mm(d, cum):
        # d) gather-free: fetch each lane's cdf row with ONE MXU matmul
        #    (onehot(idx) @ cdf), then resolve cum -> (sym,start,freq) with
        #    vector compare/reductions — no random access at all.
        c = (cum & jnp.uint32(0xFFFF)).astype(jnp.float32)
        oh = jax.nn.one_hot(d, D, dtype=jnp.float32)          # (L, D)
        rows = oh @ cdf16_f                                    # (L, M+1)
        mask = rows <= c[:, None]
        sym = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
        return sym

    def onehot_full(d, cum):
        # like onehot_mm but also extracts start/freq from the same rows
        # (what the real decode step needs) — still gather-free.
        c = (cum & jnp.uint32(0xFFFF)).astype(jnp.float32)
        oh = jax.nn.one_hot(d, D, dtype=jnp.float32)
        rows = oh @ cdf16_f
        mask = rows <= c[:, None]
        sym = jnp.sum(mask, axis=-1).astype(jnp.int32) - 1
        start = jnp.max(jnp.where(mask, rows, -1.0), axis=-1)
        nxt = jnp.min(jnp.where(mask, jnp.inf, rows), axis=-1)
        freq = nxt - start
        return sym + freq.astype(jnp.int32) + start.astype(jnp.int32)

    rows = {}
    for name, fn, xs in (("dense16", dense16, (idx, cums16)),
                         ("bsearch", bsearch, (idx, cums16)),
                         ("dense12", dense12, (idx, cums12)),
                         ("onehot_mm", onehot_mm, (idx, cums16)),
                         ("onehot_full", onehot_full, (idx, cums16))):
        t = run_scan(fn, xs)
        rows[name] = {
            "seconds": round(t, 4),
            "us_per_step": round(t / S * 1e6, 2),
            "msym_per_s": round(S * L / t / 1e6, 1),
        }
        print(json.dumps({name: rows[name]}), flush=True)
    print(json.dumps({"lanes": L, "steps": S, "summary": rows}))


if __name__ == "__main__":
    main()
