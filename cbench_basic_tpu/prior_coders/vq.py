"""Vector-quantization prior coders.

Parity targets (reference prior_coder/__init__.py):
  * MultiChannelVQPriorCoder (:4873) — channel groups quantized against
    per-group codebooks, ANS-coded indices under a learned index prior.
  * GaussianVQPriorCoder (:5895) — stochastic codeword assignment from a
    Gaussian posterior around the input feature.
  * SQVAEPriorCoder (:6368) — SQ-VAE: trainable quantization variance with
    the posterior-entropy term of the ELBO (self-annealing quantization).

TPU-first: nearest-codeword search is one batched matmul-distance kernel
per group (MXU-shaped), training uses straight-through estimators + codebook
/commitment losses (gradient codebooks rather than EMA state so the pure
functional train step needs no mutable collections), and coding flows
through the PerChannelPMFCoder rANS path with the learned index prior.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..graph.node_coders import PerChannelPMFCoder
from .categorical import gumbel_softmax_st

_EPS = 1e-9


class VQPriorCoder(PerChannelPMFCoder):
    """Multi-channel-group VQ with ANS-coded indices.

    Input (..., L*D) splits into L groups of D features; each group is
    quantized to its nearest codeword. Rate = -log2 p_prior(index) with a
    learned per-group index PMF (trained by the rd objective itself)."""

    num_groups: int = 4           # L
    num_embeddings: int = 32      # K codewords per group
    embedding_dim: int = 8        # D
    commitment_weight: float = 0.25
    codebook_weight: float = 1.0

    @property
    def in_channels(self) -> int:
        return self.num_groups * self.embedding_dim

    @property
    def out_channels(self) -> int:
        return self.num_groups * self.embedding_dim

    def setup(self):
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.num_groups, self.num_embeddings, self.embedding_dim))
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.num_groups, self.num_embeddings))

    def _split(self, value):
        return value.reshape(value.shape[:-1]
                             + (self.num_groups, self.embedding_dim))

    def _distances(self, x):
        """Squared distances to every codeword: (..., L, K) via the
        ||x||² - 2x·e + ||e||² expansion (the x·e term is an MXU matmul)."""
        x2 = jnp.sum(x ** 2, -1, keepdims=True)
        e2 = jnp.sum(self.codebook ** 2, -1)
        xe = jnp.einsum("...ld,lkd->...lk", x, self.codebook)
        return x2 - 2.0 * xe + e2

    def _assign(self, x, training: bool, rng):
        """Returns (onehot (..., L, K), quantized (..., L, D), aux dict)."""
        d2 = self._distances(x)
        onehot = jax.nn.one_hot(jnp.argmin(d2, -1), self.num_embeddings,
                                dtype=x.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        return onehot, q, {}

    def _extra_losses(self, x, q, onehot, aux):
        loss_vq = (self.codebook_weight
                   * jnp.mean((jax.lax.stop_gradient(x) - q) ** 2)
                   + self.commitment_weight
                   * jnp.mean((x - jax.lax.stop_gradient(q)) ** 2))
        return {"loss_vq": loss_vq}

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        x = self._split(value)
        onehot, q, aux = self._assign(x, training, rng)
        # Straight-through: decoder sees quantized values, encoder gets
        # identity gradients.
        value_hat = (x + jax.lax.stop_gradient(q - x)).reshape(value.shape[:-1]
                                                               + (self.out_channels,))
        pmf = jax.nn.softmax(self.prior_logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        out = {"value_hat": value_hat, "likelihood": lik,
               "metrics": {"codebook_usage": jnp.mean(jnp.max(onehot, -1))}}
        if training:
            out.update(self._extra_losses(x, q, onehot, aux))
        return out

    # -- PerChannelPMFCoder coding protocol ------------------------------------
    def pmf_table(self):
        pmf = jax.nn.softmax(self.prior_logits, -1)
        L, K = pmf.shape
        return (pmf, jnp.zeros((L,), jnp.float32),
                jnp.full((L,), K, jnp.int32), jnp.zeros((L,), jnp.int32))

    def symbols(self, value):
        return jnp.argmin(self._distances(self._split(value)),
                          -1).astype(jnp.int32)

    def dequantize(self, symbols):
        onehot = jax.nn.one_hot(symbols, self.num_embeddings, dtype=jnp.float32)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        return q.reshape(symbols.shape[:-1] + (self.out_channels,))


class GaussianVQPriorCoder(VQPriorCoder):
    """Stochastic assignment: posterior ∝ exp(-d²/2σ²) sampled with an
    ST-Gumbel draw during training; deterministic argmin at coding time
    (reference GaussianVQPriorCoder :5895)."""

    posterior_scale: float = 0.5

    def _assign(self, x, training: bool, rng):
        d2 = self._distances(x)
        logits = -d2 / (2.0 * self.posterior_scale ** 2)
        if training and rng is not None:
            onehot = gumbel_softmax_st(logits, rng, 1.0)
        else:
            onehot = jax.nn.one_hot(jnp.argmin(d2, -1), self.num_embeddings,
                                    dtype=x.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        return onehot, q, {}


class SQVAEPriorCoder(GaussianVQPriorCoder):
    """SQ-VAE (Takida et al. 2022): the quantization variance σ² is a
    TRAINABLE parameter entering both the stochastic posterior and the
    Gaussian transition likelihood ||x-q||²/2σ² + D/2·log σ², with the
    posterior-entropy ELBO term — quantization self-anneals from soft to
    hard as σ² shrinks (reference SQVAEPriorCoder :6368)."""

    init_log_var: float = 0.0

    def setup(self):
        super().setup()
        self.log_var = self.param("log_var",
                                  nn.initializers.constant(self.init_log_var),
                                  ())

    def _assign(self, x, training: bool, rng):
        var = jnp.exp(self.log_var)
        logits = -self._distances(x) / (2.0 * var)
        if training and rng is not None:
            onehot = gumbel_softmax_st(logits, rng, 1.0)
        else:
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=x.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        return onehot, q, {"logits": logits}

    def _extra_losses(self, x, q, onehot, aux):
        var = jnp.exp(self.log_var)
        d = self.embedding_dim
        # Gaussian transition p(x|q): reconstruction-in-latent + log-det.
        loss_sq = jnp.mean(jnp.sum((x - q) ** 2, -1) / (2.0 * var)
                           + 0.5 * d * self.log_var)
        # + posterior entropy term (negative entropy enters the ELBO).
        logq = jax.nn.log_softmax(aux["logits"], -1)
        neg_entropy = jnp.mean(jnp.sum(jnp.exp(logq) * logq, -1))
        return {"loss_sq": loss_sq + neg_entropy,
                "loss_vq": self.commitment_weight
                * jnp.mean((x - jax.lax.stop_gradient(q)) ** 2)}
