"""TransGAN-style transformer generator.

Parity target: reference cbench/nn/models/transgan_generator.py (Mlp :160,
Attention :179, Block :251, StageBlock :270, Generator :306) — a pure
transformer image generator growing resolution by pixel-shuffle between
token stages.

TPU-first: token attention reuses the shared MultiHeadAttention (MXU-shaped
batched matmuls), pixel-shuffle upsampling is a reshape/transpose pair XLA
fuses for free, and the whole generator is one fused program (no DropPath
host randomness; stochastic depth is a traced Bernoulli when enabled).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..attention import MultiHeadAttention


class TokenMLP(nn.Module):
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(d * self.mult)(x)
        h = jax.nn.gelu(h)
        return nn.Dense(d)(h)


class TransGANBlock(nn.Module):
    """Pre-norm attention + MLP with optional stochastic depth."""

    heads: int = 4
    dim_head: int = 32
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False, rng=None):
        def maybe_drop(branch, key):
            if not training or self.drop_path <= 0.0 or rng is None:
                return branch
            keep = jax.random.bernoulli(
                jax.random.fold_in(rng, key), 1.0 - self.drop_path)
            return branch * keep / (1.0 - self.drop_path)

        x = x + maybe_drop(
            MultiHeadAttention(self.heads, self.dim_head)(nn.LayerNorm()(x)), 0)
        x = x + maybe_drop(TokenMLP()(nn.LayerNorm()(x)), 1)
        return x


def pixel_shuffle_tokens(x, h: int, w: int, factor: int = 2):
    """(N, h*w, C) tokens -> (N, (h*f)*(w*f), C/f²): the TransGAN
    resolution-growing step as pure reshapes."""
    n, _, c = x.shape
    f = factor
    x = x.reshape(n, h, w, f, f, c // (f * f))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * f * w * f, c // (f * f))


class TransGANGenerator(nn.Module):
    """Latent vector -> image through token stages of growing resolution.

    bottom_width: initial token grid side; each stage pixel-shuffles 2x and
    halves the embedding dim (Generator :306 stage schedule).
    """

    bottom_width: int = 8
    embed_dim: int = 256
    depths: Sequence[int] = (2, 2, 2)
    heads: int = 4
    out_channels: int = 3
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, z, training: bool = False, rng=None):
        n = z.shape[0]
        hw = self.bottom_width
        dim = self.embed_dim
        x = nn.Dense(hw * hw * dim)(z).reshape(n, hw * hw, dim)
        pos = self.param("pos_0", nn.initializers.normal(0.02),
                         (1, hw * hw, dim))
        x = x + pos
        for s, depth in enumerate(self.depths):
            for d in range(depth):
                x = TransGANBlock(self.heads, max(dim // self.heads, 8),
                                  self.drop_path,
                                  name=f"stage{s}_block{d}")(
                    x, training, rng)
            if s != len(self.depths) - 1:
                x = pixel_shuffle_tokens(x, hw, hw, 2)
                hw, dim = hw * 2, dim // 4
                pos = self.param(f"pos_{s + 1}", nn.initializers.normal(0.02),
                                 (1, hw * hw, dim))
                x = x + pos
        img = nn.Dense(self.out_channels)(x).reshape(
            n, hw, hw, self.out_channels)
        return jnp.tanh(img)
