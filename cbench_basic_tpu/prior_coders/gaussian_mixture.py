"""Gaussian-mixture categorical prior coders + flat-linear-transform wrapper.

Parity targets (reference prior_coder/__init__.py):
  * NNPriorCoderFlatLinearTransform (:241) — linear in/out projections
    around a latent coder (flattened per-position features).
  * CategoricalGaussianPriorCoder (:501) — per-dim categorical posterior
    selecting a learned Gaussian component (mean/logvar banks); training
    rsamples from the chosen component; rate = categorical prior.
  * EmbeddingStandardNormalPriorCategoricalDistributionPriorCoder (:4434) —
    categorical embedding coder whose PRIOR PMF comes from the standard
    normal density of the embeddings themselves (optionally normalized).

TPU-first: all sampling is fused reparameterized math; coding reuses the
PerChannelPMFCoder rANS path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .categorical import CategoricalPriorCoder, gumbel_softmax_st

_EPS = 1e-9


class FlatLinearTransformCoder(nn.Module):
    """Dense in -> inner coder -> Dense out (NNPriorCoderFlatLinearTransform).

    The inner coder sees `inner.in_channels` features per position; the
    wrapper restores `out_channels` (default: the input width) afterwards —
    the reference's standard adapter between backbone widths and coder
    latent widths."""

    inner: nn.Module
    out_channels: int

    def setup(self):
        self.input_layer = nn.Dense(self.inner.in_channels)
        self.output_layer = nn.Dense(self.out_channels)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        out = dict(self.inner(self.input_layer(value), prior=prior,
                              training=training, rng=rng))
        out["value_hat"] = self.output_layer(out["value_hat"])
        return out


class CategoricalGaussianPriorCoder(CategoricalPriorCoder):
    """Per-dim categorical over K learned Gaussian components.

    Posterior (from the input logits) picks a component with ST-Gumbel; the
    decoder input is an rsample N(mu_k, var_scale·sigma_k²) while training
    and mu_k at eval; rate = learned categorical prior (cat_prior_logits).
    Reference :501-618 (gs_temp, var_scale, freeze_logvar knobs).
    """

    var_scale: float = 1.0
    freeze_logvar: bool = False

    @property
    def out_channels(self) -> int:
        return self.latent_dims  # scalar component per latent dim

    def _setup_extra(self):
        self.priors_mean = self.param(
            "gaussian_priors_mean",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -1.0, 1.0),
            (self.latent_dims, self.num_embeddings))
        self.priors_logvar = self.param(
            "gaussian_priors_logvar",
            nn.initializers.constant(-float(np.log(self.num_embeddings))),
            (self.latent_dims, self.num_embeddings))

    def _embed(self, onehot, training: bool, rng):
        mean = jnp.sum(onehot * self.priors_mean, -1, keepdims=True)
        if training and rng is not None:
            logvar = self.priors_logvar
            if self.freeze_logvar:
                logvar = jax.lax.stop_gradient(logvar)
            std = jnp.sum(onehot * jnp.exp(0.5 * logvar), -1, keepdims=True)
            mean = mean + self.var_scale * std * jax.random.normal(
                rng, mean.shape, mean.dtype)
        return mean

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        logits = self._posterior_logits(value)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            rng, st_rng, emb_rng = jax.random.split(rng, 3)
            onehot = gumbel_softmax_st(logits, st_rng, self.tau)
        else:
            emb_rng = None
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=logits.dtype)
        feats = self._embed(onehot, training, emb_rng)
        value_hat = feats.reshape(value.shape[:-1] + (self.out_channels,))
        pmf = self.prior_pmf()
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        return {"value_hat": value_hat, "likelihood": lik}

    def dequantize(self, symbols):
        onehot = jax.nn.one_hot(symbols, self.num_embeddings,
                                dtype=jnp.float32)
        return jnp.sum(onehot * self.priors_mean, -1)


class EmbeddingGaussianPriorCategoricalCoder(CategoricalPriorCoder):
    """Categorical embedding coder whose code prior is a LEARNED Gaussian
    mixture over embedding space (reference
    EmbeddingGaussianPriorCategoricalDistributionPriorCoder :4462-4529):
    p(k) ∝ Σ_m π_m N(e_k; μ_m, diag σ²_m), normalized over the codebook,
    plus a global KL(N(μ_m, σ²_m) || N(0, I)) regularizer scaled by
    1/dataset-size (global_latent_normalizer) that anchors the mixture."""

    gaussian_mixture_dim: int = 0          # 0 -> num_embeddings
    global_latent_normalizer: float = 1.0 / 60000

    @property
    def _mix(self) -> int:
        return self.gaussian_mixture_dim or self.num_embeddings

    def _setup_prior(self):
        self.mix_logits = self.param(
            "mix_logits", nn.initializers.zeros,
            (self.latent_dims, self._mix))
        self.mix_mean = self.param(
            "mix_mean", nn.initializers.uniform(2.0),
            (self.latent_dims, self._mix, self.embedding_dim))
        self.mix_logvar = self.param(
            "mix_logvar", nn.initializers.uniform(2.0),
            (self.latent_dims, self._mix, self.embedding_dim))

    def prior_pmf(self) -> jnp.ndarray:
        # log N(e_k; mu_m, diag var_m): (L, K, Mix)
        e = self.embedding[:, :, None, :]          # (L, K, 1, D)
        mu = self.mix_mean[:, None, :, :]          # (L, 1, Mix, D)
        lv = self.mix_logvar[:, None, :, :]
        logp = -0.5 * jnp.sum(
            (e - mu) ** 2 / jnp.exp(lv) + lv + jnp.log(2 * jnp.pi), -1)
        logits = jax.nn.logsumexp(
            logp + jax.nn.log_softmax(self.mix_logits, -1)[:, None, :], -1)
        return jax.nn.softmax(logits, axis=-1)      # normalize over codes

    def __call__(self, value, prior=None, training: bool = True,
                 rng=None):
        out = super().__call__(value, prior=prior, training=training, rng=rng)
        if training:
            kl_g = -0.5 * jnp.sum(1 + self.mix_logvar - self.mix_mean ** 2
                                  - jnp.exp(self.mix_logvar))
            batch = value.shape[0] if value.ndim > 1 else 1
            out["loss_gmm"] = kl_g * batch * self.global_latent_normalizer
        return out


class EmbeddingCategoricalPriorCoder(CategoricalPriorCoder):
    """The plain embedding-categorical coder (reference
    EmbeddingCategoricalDistributionPriorCoder, prior_coder/__init__.py:4338):
    the base class's learned-logits prior + embedding decode, plus the
    reference's embedding knobs — one-hot initialization, init method
    (uniform/normal/position), frozen embeddings, and trainable
    embedding-variance sampling (optionally with an entropy bonus)."""

    one_hot_initialization: bool = False
    embedding_init_method: str = "uniform"   # uniform | normal | position
    fix_embedding: bool = False
    embedding_variance: float = 0.0
    embedding_variance_trainable: bool = False
    use_embedding_variance_entropy: bool = False

    def setup(self):
        L, K = self.latent_dims, self.num_embeddings
        D = K if self.one_hot_initialization else self.embedding_dim

        def init(rng, shape):
            if self.one_hot_initialization:
                return jnp.broadcast_to(jnp.eye(K), (L, K, K))
            if self.embedding_init_method == "normal":
                return jax.random.normal(rng, shape)
            if self.embedding_init_method == "position":
                pos = jnp.cos(jnp.arange(K * D) / K * 2 * jnp.pi)
                return jnp.broadcast_to(pos.reshape(K, D), shape)
            return jax.random.uniform(rng, shape, minval=-1.0, maxval=1.0)

        self.embedding = self.param("embedding", init, (L, K, D))
        if self.embedding_variance > 0 and self.embedding_variance_trainable:
            self.embedding_logvar = self.param(
                "embedding_logvar",
                nn.initializers.constant(
                    float(np.log(self.embedding_variance))), (L, K, D))
        self._setup_prior()
        self._setup_extra()

    @property
    def out_channels(self) -> int:
        D = (self.num_embeddings if self.one_hot_initialization
             else self.embedding_dim)
        return self.latent_dims * D

    def _embed(self, onehot, training: bool, rng):
        emb = self.embedding
        if self.fix_embedding:
            emb = jax.lax.stop_gradient(emb)
        out = jnp.einsum("...lk,lkd->...ld", onehot, emb)
        if training and self.embedding_variance > 0 and rng is not None:
            if self.embedding_variance_trainable:
                std = jnp.exp(0.5 * jnp.einsum(
                    "...lk,lkd->...ld", onehot, self.embedding_logvar))
            else:
                std = jnp.sqrt(self.embedding_variance)
            out = out + std * jax.random.normal(rng, out.shape)
        return out

    def __call__(self, value, prior=None, training: bool = True, rng=None):
        out = super().__call__(value, prior=prior, training=training, rng=rng)
        if (training and self.embedding_variance > 0
                and self.embedding_variance_trainable
                and self.use_embedding_variance_entropy):
            # maximize Gaussian entropy ~ 0.5*sum(logvar): negative loss term
            out["loss_emb_entropy"] = -0.5 * jnp.mean(self.embedding_logvar)
        return out


class EmbeddingStandardNormalPriorCategoricalCoder(CategoricalPriorCoder):
    """Categorical embedding coder whose prior PMF is the standard-normal
    density of the embeddings: p(k) ∝ exp(-||e_k||²/2) (reference :4434,
    normalize_embedding_prob=True semantics) — codes cost what their
    embeddings cost under N(0, I), pulling the codebook toward the origin.
    """

    def _setup_prior(self):
        pass  # prior derives from the embedding itself

    def prior_pmf(self) -> jnp.ndarray:
        logp = -0.5 * jnp.sum(self.embedding ** 2, -1)      # (L, K)
        return jax.nn.softmax(logp, axis=-1)
