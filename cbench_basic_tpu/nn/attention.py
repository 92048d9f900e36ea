"""Attention layers and the EntroFormer-style transformer context model.

Parity targets:
  * reference cbench/nn/layers/attention.py — CrossAttention,
    BasicTransformerBlock (GEGLU feed-forward, pre-norm), LinearAttention,
    SpatialSelfAttention.
  * the EntroFormer TransDecoder used by GaussianEntroFormerPriorCoder
    (pgm_coder.py:3217-3282): a transformer over spatial latent tokens with
    2D relative-position bias and topogroup-causal masking, producing
    per-position entropy parameters.

TPU-first: attention is laid out as (batch·heads, tokens, head_dim) batched
matmuls (MXU-shaped); the causal structure enters as an ADDITIVE mask bias
(static or derived from the topogroup map) rather than dynamic gathering, so
one compiled program serves every decode group-step with only the bias
changing. Relative-position bias is a static (2H-1)x(2W-1) learned table
gathered once per shape. Optional non-overlapping window partitioning keeps
the token count bounded for large images.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_NEG_INF = -1e9


def rel_pos_index(h: int, w: int, position_num: int) -> np.ndarray:
    """(h*w, h*w) indices into a (2P-1)² bucketed relative-position table.

    Relative offsets are clipped to ±(P-1) (the reference EntroFormer's
    position_num buckets) so the table size is shape-independent and one
    set of parameters serves every image size."""
    P = position_num
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], -1)          # (T, 2)
    rel = np.clip(pos[:, None, :] - pos[None, :, :], -(P - 1), P - 1)
    rel = rel + P - 1
    return rel[..., 0] * (2 * P - 1) + rel[..., 1]


class GEGLU(nn.Module):
    """Gated-GELU feed-forward gate (reference attention.py:86)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        x, gate = jnp.split(nn.Dense(self.dim_out * 2)(x), 2, axis=-1)
        return x * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    """Pre-norm transformer MLP with optional GEGLU (reference :96)."""

    dim: int
    mult: int = 4
    glu: bool = True

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = GEGLU(inner)(x) if self.glu else jax.nn.gelu(nn.Dense(inner)(x))
        return nn.Dense(self.dim)(h)


class MultiHeadAttention(nn.Module):
    """Multi-head (self or cross) attention over token sequences.

    bias: optional additive attention bias broadcastable to
    (batch, heads, q_tokens, k_tokens) — carries both the causal mask
    (-inf entries) and the relative-position term.
    """

    heads: int = 8
    dim_head: int = 64
    att_scale: bool = True

    @nn.compact
    def __call__(self, x, context=None, bias=None):
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)

        def split(t):
            return t.reshape(t.shape[:-1] + (self.heads, self.dim_head)) \
                    .swapaxes(-3, -2)                      # (..., H, T, Dh)

        q, k, v = split(q), split(k), split(v)
        if self.att_scale:
            q = q * (self.dim_head ** -0.5)
        attn = jnp.einsum("...htd,...hsd->...hts", q, k)
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("...hts,...hsd->...htd", attn, v)
        out = out.swapaxes(-3, -2).reshape(x.shape[:-1] + (inner,))
        return nn.Dense(x.shape[-1], name="to_out")(out)


class TransformerBlock(nn.Module):
    """Pre-norm self-attention + GEGLU FF block (reference :245)."""

    heads: int = 8
    dim_head: int = 64
    mult: int = 4

    @nn.compact
    def __call__(self, x, bias=None):
        x = x + MultiHeadAttention(self.heads, self.dim_head)(
            nn.LayerNorm()(x), bias=bias)
        x = x + FeedForward(x.shape[-1], self.mult)(nn.LayerNorm()(x))
        return x


class LinearAttention(nn.Module):
    """O(T) softmax-kernel linear attention (reference :129): per-head
    softmax over keys, aggregation k^T v then q·(k^T v)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False)(x)
        qkv = qkv.reshape(n, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (N,T,H,Dh)
        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=1)
        ctx = jnp.einsum("nthd,nthe->nhde", k, v)
        out = jnp.einsum("nthd,nhde->nthe", q, ctx)
        return nn.Conv(c, (1, 1))(out.reshape(n, h, w, inner))


class SpatialSelfAttention(nn.Module):
    """Single-head conv-projected spatial self-attention with residual
    (reference :148); used inside synthesis/analysis model variants."""

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hN = nn.GroupNorm(num_groups=min(32, c))(x)
        q = nn.Conv(c, (1, 1))(hN).reshape(n, h * w, c)
        k = nn.Conv(c, (1, 1))(hN).reshape(n, h * w, c)
        v = nn.Conv(c, (1, 1))(hN).reshape(n, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("ntc,nsc->nts", q, k) * (c ** -0.5), axis=-1)
        out = jnp.einsum("nts,nsc->ntc", attn, v).reshape(n, h, w, c)
        return x + nn.Conv(c, (1, 1))(out)


class EntroFormerContext(nn.Module):
    """Transformer context model over spatial latent tokens with 2D
    relative-position bias and an externally supplied causal key mask.

    Drop-in alternative to the conv context in TopoGroupGaussianCoder:
    called with the group-visibility-zeroed latent plus a per-position key
    validity mask; returns per-position context features. Parity:
    TransDecoder in GaussianEntroFormerPriorCoder (pgm_coder.py:3235).
    """

    out_channels: int
    dim_embed: int = 192
    depth: int = 2
    heads: int = 6
    dim_head: int = 32
    mult: int = 4
    window: int = 0   # 0 = full attention; else non-overlapping WxW windows
    position_num: int = 7  # relative-position bucket radius (reference default)

    @nn.compact
    def __call__(self, y_visible, key_mask=None):
        """y_visible: (N, H, W, C) latents zeroed outside the causal set.
        key_mask: optional (N, H, W) bool — positions usable as keys."""
        n, h, w, _ = y_visible.shape
        x = nn.Dense(self.dim_embed)(y_visible)

        if self.window and (h > self.window or w > self.window):
            wh = ww = self.window
            assert h % wh == 0 and w % ww == 0, "pad latents to the window"
            x = x.reshape(n, h // wh, wh, w // ww, ww, self.dim_embed) \
                 .transpose(0, 1, 3, 2, 4, 5) \
                 .reshape(n, (h // wh) * (w // ww), wh * ww, self.dim_embed)
            km = None
            if key_mask is not None:
                km = key_mask.reshape(n, h // wh, wh, w // ww, ww) \
                             .transpose(0, 1, 3, 2, 4) \
                             .reshape(n, (h // wh) * (w // ww), wh * ww)
            x = self._run(x, km, wh, ww)
            x = x.reshape(n, h // wh, w // ww, wh, ww, self.dim_embed) \
                 .transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, self.dim_embed)
        else:
            x = self._run(x.reshape(n, h * w, self.dim_embed),
                          None if key_mask is None
                          else key_mask.reshape(n, h * w), h, w)
            x = x.reshape(n, h, w, self.dim_embed)
        return nn.Dense(self.out_channels)(x)

    def _run(self, tokens, key_mask, h, w):
        """tokens (..., T, E); key_mask (..., T) bool or None."""
        P = self.position_num
        table = self.param("rel_pos_bias", nn.initializers.zeros,
                           ((2 * P - 1) * (2 * P - 1), self.heads))
        idx = jnp.asarray(rel_pos_index(h, w, P))
        rel = jnp.take(table, idx, axis=0)                 # (T, T, heads)
        bias = jnp.moveaxis(rel, -1, 0)                    # (heads, T, T)
        if key_mask is not None:
            # Rows with no valid key yet (the first topogroup) softmax over a
            # constant -1e9 row -> uniform over zero-input tokens, which is
            # deterministic and identical on the encode and decode sides.
            km = jnp.where(key_mask[..., None, None, :], 0.0, _NEG_INF)
            bias = bias + km                                # (..., 1, 1, T)
        for i in range(self.depth):
            tokens = TransformerBlock(self.heads, self.dim_head,
                                      self.mult, name=f"block_{i}")(
                tokens, bias=bias)
        return tokens
