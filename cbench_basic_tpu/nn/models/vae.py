"""Plain Gaussian VAE encoder/decoder.

Parity target: reference cbench/nn/models/vae.py (VAEEncoder :10 /
VAEDecoder :47) — strided conv encoder to (mu, logvar), mirrored
transposed-conv decoder; used by the VAE-based prior models and as the
backbone for BB-ANS-style bits-back latents.

TPU-first: NHWC layout, fused single forward; the reparameterized sample
happens inside the jitted forward (no host RNG round-trips).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class VAEEncoder(nn.Module):
    """Strided conv stack -> (mu, logvar) over a latent feature map."""

    latent_channels: int = 64
    hidden: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, x):
        h = x
        for c in self.hidden:
            h = nn.Conv(c, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
        mu = nn.Conv(self.latent_channels, (3, 3), padding="SAME")(h)
        logvar = nn.Conv(self.latent_channels, (3, 3), padding="SAME")(h)
        return mu, jnp.clip(logvar, -10.0, 10.0)


class VAEDecoder(nn.Module):
    """Mirrored transposed-conv stack from the latent map to the image."""

    out_channels: int = 3
    hidden: Sequence[int] = (128, 64, 32)

    @nn.compact
    def __call__(self, z):
        h = z
        for c in self.hidden:
            h = nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class VAE(nn.Module):
    """Encoder + reparameterized sample + decoder, returning the ELBO parts.

    forward -> dict(x_hat, mu, logvar, kl): kl is the per-image analytic
    Gaussian KL to N(0, I) in nats; the trainer combines it with the
    reconstruction term.
    """

    latent_channels: int = 64
    hidden: Sequence[int] = (32, 64, 128)
    out_channels: int = 3

    def setup(self):
        self.encoder = VAEEncoder(self.latent_channels, self.hidden)
        self.decoder = VAEDecoder(self.out_channels, tuple(reversed(self.hidden)))

    def __call__(self, x, training: bool = True, rng=None
                 ) -> Tuple[jnp.ndarray, dict]:
        mu, logvar = self.encoder(x)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        else:
            z = mu
        x_hat = self.decoder(z)
        kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu ** 2 - 1.0 - logvar,
                           axis=(1, 2, 3))
        return {"x_hat": x_hat, "mu": mu, "logvar": logvar, "kl": kl, "z": z}

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)
