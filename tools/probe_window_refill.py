#!/usr/bin/env python
"""Measure the windowed lane-word read strategy for the decode scan.

The decode scan's residual gather is the per-lane stream-word read
(lane_words[arange(L), ptr]) — one serial-unit gather (~25 M elem/s)
per step. The window trick: every W steps, refill a (L, W) window with a
BATCHED CONTIGUOUS dynamic-slice (one W-wide slice per lane — the
hypothesis is that XLA lowers this per-slice, not per-element), then
select each step's word from the window with a masked reduction
(compare-multiply-sum over W columns — pure VPU, no gather).

Variants timed over a dependent scan shaped like the decoder:
  a) gather_word:   per-step L-element gather (today's path)
  b) window_select: refill every W steps + masked-reduce select
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
    p.add_argument("--steps", type=int, default=432)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    L, S, W = args.lanes, args.steps, args.window
    rng = np.random.default_rng(0)
    maxw = S + 2 * W
    words = jnp.asarray(rng.integers(0, 1 << 16, (L, maxw)), jnp.uint16)
    # pseudo-random per-step consume decisions (~50% renorm rate)
    need = jnp.asarray(rng.uniform(0, 1, (S, L)) < 0.5)

    def run(f, xs):
        g = jax.jit(f)
        g(xs)[0].block_until_ready()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            g(xs)[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    lanes_i = jnp.arange(L)

    def gather_word(needs):
        def body(carry, nd):
            acc, ptr = carry
            w = words[lanes_i, ptr].astype(jnp.uint32)
            acc = acc ^ jnp.where(nd, w, 0)
            return (acc, ptr + nd.astype(jnp.int32)), None

        return jax.lax.scan(body, (jnp.zeros((L,), jnp.uint32),
                                   jnp.zeros((L,), jnp.int32)), needs)[0]

    t_g = run(gather_word, need)

    C = S // W
    need_chunks = need[: C * W].reshape(C, W, L)

    def window_select(needs):
        def chunk(carry, nd_chunk):
            acc, ptr = carry
            win = jax.vmap(
                lambda row, p: jax.lax.dynamic_slice(row, (p,), (W,))
            )(words, ptr).astype(jnp.uint32)                   # (L, W)
            c = jnp.zeros((L,), jnp.int32)
            cols = jnp.arange(W)
            for w in range(W):                                  # unrolled
                nd = nd_chunk[w]
                sel = jnp.sum(
                    win * (cols[None, :] == c[:, None]), axis=-1)
                acc = acc ^ jnp.where(nd, sel, 0)
                c = c + nd.astype(jnp.int32)
            return (acc, ptr + c), None

        return jax.lax.scan(chunk, (jnp.zeros((L,), jnp.uint32),
                                    jnp.zeros((L,), jnp.int32)),
                            need_chunks)[0]

    t_w = run(window_select, need_chunks)

    out = {
        "lanes": L, "steps": S, "window": W,
        "gather_word_us_per_step": round(t_g / S * 1e6, 2),
        "window_select_us_per_step": round(t_w / (C * W) * 1e6, 2),
        "speedup": round(t_g / S / (t_w / (C * W)), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
