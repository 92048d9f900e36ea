"""UNet generator.

Parity target: reference cbench/nn/models/unet.py (UNetDown :5, UNetUp :20,
GeneratorUNet :40) — the pix2pix-style UNet used as a perceptual /
restoration backbone.

TPU-first: NHWC, GroupNorm instead of per-device BatchNorm (no cross-device
stats sync needed under pjit), skip connections concatenated on the channel
axis so every stage stays a dense MXU conv.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class UNetDown(nn.Module):
    features: int
    normalize: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = nn.Conv(self.features, (4, 4), strides=(2, 2), padding="SAME",
                    use_bias=not self.normalize)(x)
        if self.normalize:
            h = nn.GroupNorm(num_groups=min(8, self.features))(h)
        h = nn.leaky_relu(h, 0.2)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return h


class UNetUp(nn.Module):
    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, skip, training: bool = False):
        h = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False)(x)
        h = nn.GroupNorm(num_groups=min(8, self.features))(h)
        h = nn.relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return jnp.concatenate([h, skip], axis=-1)


class GeneratorUNet(nn.Module):
    """Symmetric UNet: depth-N down stack, mirrored up stack with skips."""

    out_channels: int = 3
    features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, training: bool = False):
        skips = []
        h = x
        for i, f in enumerate(self.features):
            h = UNetDown(f, normalize=(i > 0))(h, training)
            skips.append(h)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips[:-1])):
            h = UNetUp(f)(h, skip, training)
        h = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                             padding="SAME")(h)
        return jnp.tanh(h)
