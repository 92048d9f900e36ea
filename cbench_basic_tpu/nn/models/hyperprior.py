"""Ballé-2018 hyperprior NIC models (scale & mean-scale variants).

Capability parity with the reference's Google-model stacks
(cbench/nn/models/google.py:25-192: analysis/synthesis + hyper transforms)
and the CompressAI hyperprior prior-coders the reference wraps
(compressai_coder.py:400,556). NHWC, jit-friendly, pure flax.

Geometry: 16x spatial downsampling x->y (4 conv s2), 4x further y->z.
Inputs must be multiples of 64 (use data.transforms.aligned_pad).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy_models import EntropyBottleneck, GaussianConditional
from ..layers import GDN, conv, deconv


class AnalysisTransform(nn.Module):
    """g_a: image -> latent y. num_stages x (conv5x5 s2 + GDN); the default
    4 stages give the reference's 16x spatial stride."""
    N: int = 192
    M: int = 192
    num_stages: int = 4

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_stages - 1):
            x = conv(self.N)(x)
            x = GDN()(x)
        return conv(self.M)(x)


class SynthesisTransform(nn.Module):
    """g_s: latent y -> reconstruction. num_stages x (deconv5x5 s2 + IGDN)."""
    N: int = 192
    num_stages: int = 4

    @nn.compact
    def __call__(self, y):
        for _ in range(self.num_stages - 1):
            y = deconv(self.N)(y)
            y = GDN(inverse=True)(y)
        return deconv(3)(y)


class HyperAnalysisTransform(nn.Module):
    """h_a: y -> z (abs + conv3 s1 + 2x conv5 s2)."""
    N: int = 192
    use_abs: bool = True

    @nn.compact
    def __call__(self, y):
        if self.use_abs:
            y = jnp.abs(y)
        y = nn.relu(conv(self.N, kernel=3, stride=1)(y))
        y = nn.relu(conv(self.N)(y))
        return conv(self.N)(y)


class HyperSynthesisTransform(nn.Module):
    """h_s: z -> prior params for y (2x deconv5 s2 + conv3 s1)."""
    N: int = 192
    out_channels: int = 192

    @nn.compact
    def __call__(self, z):
        z = nn.relu(deconv(self.N)(z))
        z = nn.relu(deconv(self.N)(z))
        return conv(self.out_channels, kernel=3, stride=1)(z)


class ScaleHyperprior(nn.Module):
    """Ballé 2018: z codes per-element Gaussian scales for y."""
    N: int = 192
    M: int = 192

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N)
        self.h_a = HyperAnalysisTransform(self.N, use_abs=True)
        self.h_s = HyperSynthesisTransform(self.N, out_channels=self.M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian = GaussianConditional()

    @property
    def has_mean(self) -> bool:
        return False

    def prior_params(self, z_hat):
        scales = self.h_s(z_hat)
        return scales, None

    def __call__(self, x, training: bool = True, rng: Optional[jax.Array] = None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, training=training, rng=rngs[0])
        scales, means = self.prior_params(z_hat)
        y_hat, y_lik = self.gaussian(y, scales, means, training=training, rng=rngs[1])
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
            "latents": {"y": y, "z": z},
        }

    # -- coding-path pieces (each jitted separately by the codec) ------------
    def analysis(self, x):
        return self.g_a(x)

    def hyper_analysis(self, y):
        return self.h_a(y)

    def hyper_synthesis(self, z_hat):
        return self.prior_params(z_hat)

    def synthesis(self, y_hat):
        return self.g_s(y_hat)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()

    def eb_pmf_table(self):
        return self.entropy_bottleneck.pmf_table()

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class MeanScaleHyperprior(ScaleHyperprior):
    """Minnen 2018 mean-scale variant: h_s outputs (scales, means)."""

    def setup(self):
        self.g_a = AnalysisTransform(self.N, self.M)
        self.g_s = SynthesisTransform(self.N)
        self.h_a = HyperAnalysisTransform(self.N, use_abs=False)
        self.h_s = HyperSynthesisTransform(self.N, out_channels=2 * self.M)
        self.entropy_bottleneck = EntropyBottleneck(self.N)
        self.gaussian = GaussianConditional()

    @property
    def has_mean(self) -> bool:
        return True

    def prior_params(self, z_hat):
        params = self.h_s(z_hat)
        scales, means = jnp.split(params, 2, axis=-1)
        return scales, means
