"""Distribution-codeword VQ prior coders.

Parity targets (reference prior_coder/__init__.py):
  * DistributionVQPriorCoder (:6225) — codewords parameterize DISTRIBUTIONS
    (not point vectors); assignment is GMM responsibility under the learned
    code-frequency mixture, the coded index selects a component.
  * UnivarGaussianDistributionVQPriorCoder (:6308) — diagonal-Gaussian
    codewords (mean, logvar per dim).
  * LRMultivarGaussianDistributionVQPriorCoder (:6336) — low-rank-plus-
    diagonal Gaussian codewords (LowRankMultivariateNormal).
  * VQGaussianEmbeddingPriorCoder (:6151) — point codewords with learned
    per-code Gaussian noise injected while training.

TPU-first: component log-probs are computed for ALL codewords at once as
batched dense algebra (the cross terms are MXU matmuls); the low-rank
covariance solve uses the Woodbury identity on a static-rank (R<=4) capacitance
matrix so everything stays inside one fused XLA program. Coding reuses the
PerChannelPMFCoder rANS path (learned index prior = mixture weights).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .vq import VQPriorCoder

_EPS = 1e-9
_LOG2PI = float(np.log(2.0 * np.pi))


class UnivarGaussianDistributionVQPriorCoder(VQPriorCoder):
    """VQ whose codewords are diagonal Gaussians N(mu_k, diag(sigma_k^2)).

    Posterior over codes = mixture responsibility
      q(k|x) ∝ pi_k * N(x; mu_k, sigma_k²)
    (pi = learned code frequency prior); training samples the assignment
    with an ST-Gumbel draw and reconstructs with an rsample from the chosen
    component; eval/coding uses the argmax component and its mean.
    """

    init_log_var: float = -2.0
    sample_embedding: bool = True  # rsample from the chosen codeword (train)

    def setup(self):
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.num_groups, self.num_embeddings, self.embedding_dim))
        self.code_logvar = self.param(
            "code_logvar", nn.initializers.constant(self.init_log_var),
            (self.num_groups, self.num_embeddings, self.embedding_dim))
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.num_groups, self.num_embeddings))

    def _component_log_prob(self, x):
        """log N(x; mu_k, sigma_k²) for every codeword: (..., L, K)."""
        var = jnp.exp(self.code_logvar)                      # (L, K, D)
        # sum_d [ (x-mu)^2/var + logvar + log2pi ] expanded so the x·(mu/var)
        # term is a single MXU matmul:
        x2v = jnp.einsum("...ld,lkd->...lk", x ** 2, 1.0 / var)
        xmv = jnp.einsum("...ld,lkd->...lk", x, self.codebook / var)
        m2v = jnp.sum(self.codebook ** 2 / var, -1)          # (L, K)
        logdet = jnp.sum(self.code_logvar, -1)               # (L, K)
        return -0.5 * (x2v - 2.0 * xmv + m2v + logdet
                       + self.embedding_dim * _LOG2PI)

    def _assign(self, x, training: bool, rng):
        from .categorical import gumbel_softmax_st
        logits = self._component_log_prob(x) \
            + jax.nn.log_softmax(self.prior_logits, -1)
        if training and rng is not None:
            rng, s_rng = jax.random.split(rng)
            onehot = gumbel_softmax_st(logits, s_rng, 1.0)
        else:
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=x.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        if training and self.sample_embedding and rng is not None:
            std = jnp.einsum("...lk,lkd->...ld", onehot,
                             jnp.exp(0.5 * self.code_logvar))
            q = q + std * jax.random.normal(rng, q.shape, q.dtype)
        return onehot, q, {"logits": logits}

    def _extra_losses(self, x, q, onehot, aux):
        # Negative chosen-component log-likelihood pulls codewords toward
        # their assigned inputs (the GMM M-step in gradient form); the
        # commitment term pulls the encoder toward codeword means.
        nll = -jnp.mean(jnp.sum(onehot * aux["logits"], -1))
        commit = self.commitment_weight * jnp.mean(
            (x - jax.lax.stop_gradient(q)) ** 2)
        return {"loss_vq": self.codebook_weight * nll / self.embedding_dim
                + commit}

    def symbols(self, value):
        x = self._split(value)
        logits = self._component_log_prob(x) \
            + jax.nn.log_softmax(self.prior_logits, -1)
        return jnp.argmax(logits, -1).astype(jnp.int32)


class LRMultivarGaussianDistributionVQPriorCoder(
        UnivarGaussianDistributionVQPriorCoder):
    """Low-rank-plus-diagonal Gaussian codewords:
    Sigma_k = F_k F_k^T + diag(sigma_k²), F_k of static rank R.

    The Mahalanobis term uses the Woodbury identity
      Sigma⁻¹ = D⁻¹ - D⁻¹ F (I + Fᵀ D⁻¹ F)⁻¹ Fᵀ D⁻¹
    with the RxR capacitance solved by jnp.linalg.solve on static shapes,
    and log|Sigma| = log|I + Fᵀ D⁻¹ F| + log|D| — no KxK work, everything
    batched over (L, K).
    """

    dist_rank: int = 2

    def setup(self):
        super().setup()
        self.code_factor = self.param(
            "code_factor", nn.initializers.normal(0.1),
            (self.num_groups, self.num_embeddings, self.embedding_dim,
             self.dist_rank))

    def _component_log_prob(self, x):
        var = jnp.exp(self.code_logvar)                       # (L,K,D)
        F = self.code_factor                                  # (L,K,D,R)
        dinv_F = F / var[..., None]                           # (L,K,D,R)
        cap = (jnp.eye(self.dist_rank)
               + jnp.einsum("lkdr,lkds->lkrs", F, dinv_F))    # (L,K,R,R)
        cap_chol = jnp.linalg.cholesky(cap)
        logdet = (2.0 * jnp.sum(jnp.log(jnp.diagonal(
            cap_chol, axis1=-2, axis2=-1)), -1)
            + jnp.sum(self.code_logvar, -1))                  # (L,K)

        diff_fn = lambda xi: xi[..., None, :] - self.codebook  # (...,L,K,D)
        diff = diff_fn(x)
        # Mahalanobis: diffᵀD⁻¹diff - ||cap_chol⁻¹ Fᵀ D⁻¹ diff||²
        d_dinv = jnp.sum(diff ** 2 / var, -1)                  # (...,L,K)
        t = jnp.einsum("...lkd,lkdr->...lkr", diff, dinv_F)    # (...,L,K,R)
        R = self.dist_rank
        chol_b = jnp.broadcast_to(cap_chol, t.shape[:-1] + (R, R))
        y = jax.scipy.linalg.solve_triangular(
            chol_b, t[..., None], lower=True)[..., 0]
        maha = d_dinv - jnp.sum(y ** 2, -1)
        return -0.5 * (maha + logdet + self.embedding_dim * _LOG2PI)


class VQGaussianEmbeddingPriorCoder(VQPriorCoder):
    """Point-codeword VQ with learned per-code Gaussian embedding noise while
    training (reference VQGaussianEmbeddingPriorCoder :6151): the decoder
    input is N(e_k, sigma_k²) during training and e_k at eval/coding —
    regularizes the decoder against codeword drift."""

    init_log_var: float = -4.0

    def setup(self):
        super().setup()
        self.emb_logvar = self.param(
            "emb_logvar", nn.initializers.constant(self.init_log_var),
            (self.num_groups, self.num_embeddings, self.embedding_dim))

    def _assign(self, x, training: bool, rng):
        onehot, q, aux = super()._assign(x, training, rng)
        if training and rng is not None:
            std = jnp.einsum("...lk,lkd->...ld", onehot,
                             jnp.exp(0.5 * self.emb_logvar))
            q = q + std * jax.random.normal(rng, q.shape, q.dtype)
        return onehot, q, aux
