"""Stochastic-VQ autoregressive prior coders + continuous-to-VQ blend.

Parity targets (reference prior_coder/__init__.py):
  * StochasticVQAutoregressivePriorDistributionPriorCoder (:1878-2314) —
    the SQ-VAE-AR construction: posterior = softmax of negative codeword
    distances under a TRAINABLE variance (gaussian) or vMF concentration,
    prior = autoregressive categorical over the latent dims, plus the
    continuous VQ/commitment ELBO term, straight-through options, an
    optional autoregressive posterior refiner, and EMA codebook updates.
  * VQPriorStochasticVQAutoregressivePriorDistributionPriorCoder
    (:2316-2334) — prior logits derived from learned "prior codes" scored
    against the codebook instead of the AR net.
  * ContinuousToVQDistributionPriorCoder (:2744-2908) — a Gaussian VAE
    posterior whose samples BLEND (interpolate/random) with a VQ
    quantization of the mean as relax_temp anneals 1 -> 0: continuous KL
    fades out while the discrete quant/commit losses and code rate fade in.

TPU-first: training is one fused pass (pairwise-distance logits are MXU
matmuls, ST-Gumbel sampling, static unroll over the L latent dims for the
AR posterior); EMA is a pure functional update the host applies between
steps (no mutable collections in the jitted loss). Coding reuses the
AR host-loop protocol of AutoregressiveCategoricalPriorCoder.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .categorical import (
    AutoregressiveCategoricalPriorCoder,
    CategoricalPriorCoder,
    gumbel_softmax_st,
)
from ..graph.node_coders import PerChannelPMFCoder

_EPS = 1e-9


class StochasticVQARPriorCoder(AutoregressiveCategoricalPriorCoder):
    """SQ-VAE-style stochastic VQ posterior with an AR categorical prior.

    Input is (..., L*D) CONTINUOUS features (unlike the logits-input
    categorical coders): posterior logits are negative codeword distances
    scaled by a trainable variance (distance_method="gaussian",
    reference :1985-2014) or normalized cosines over a concentration
    ("vmf"). The rate prior is the inherited AR net over sampled dims.
    """

    distance_method: str = "gaussian"      # "gaussian" | "vmf"
    embedding_variance: float = 1.0        # initial sigma^2 (exp-reparam)
    variance_per_channel: bool = False
    variance_trainable: bool = True
    cont_loss_weight: float = 1.0          # reference cont_loss_weight
    separate_update_cont_loss: bool = False
    vq_loss_weight: float = 1.0
    commit_loss_weight: float = 1.0
    straight_through: bool = False         # reference force_st
    st_weight: float = 1.0
    use_ar_posterior: bool = False         # posterior_ar_model (:1973-1980)

    @property
    def in_channels(self) -> int:
        return self.latent_dims * self.embedding_dim

    def _setup_extra(self):
        shape = (self.latent_dims,) if self.variance_per_channel else (1,)
        init = nn.initializers.constant(jnp.log(self.embedding_variance))
        if self.variance_trainable:
            self.log_variance = self.param("log_variance", init, shape)
        else:
            self.log_variance = init(jax.random.PRNGKey(0), shape)
        if self.use_ar_posterior:
            D = self.embedding_dim
            self.posterior_ar_net = nn.Sequential([
                nn.Dense(3 * D), nn.leaky_relu,
                nn.Dense(2 * D), nn.leaky_relu,
                nn.Dense(D),
            ])

    def _variance(self):
        v = jnp.exp(self.log_variance)
        return v[:, None] if self.variance_per_channel else v  # (L,1)|(1,)

    def _features(self, value):
        return value.reshape(value.shape[:-1]
                             + (self.latent_dims, self.embedding_dim))

    def _ar_refine(self, x):
        """Sequential posterior refinement: dim i sees (x_{i-1}, x_i)
        (reference _autoregressive_posterior :2301-2313); static unroll."""
        outs = []
        for i in range(self.latent_dims):
            prev = (jnp.zeros_like(x[..., 0, :]) if i == 0
                    else x[..., i - 1, :])
            outs.append(self.posterior_ar_net(
                jnp.concatenate([prev, x[..., i, :]], -1)))
        return jnp.stack(outs, axis=-2)

    def _dist_logits(self, x):
        """(..., L, D) -> (..., L, K) posterior logits."""
        if self.distance_method == "vmf":
            xn = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), _EPS)
            en = self.embedding / jnp.maximum(
                jnp.linalg.norm(self.embedding, axis=-1, keepdims=True), _EPS)
            return jnp.einsum("...ld,lkd->...lk", xn, en) / self._variance()
        x2 = jnp.sum(x ** 2, -1, keepdims=True)
        e2 = jnp.sum(self.embedding ** 2, -1)
        xe = jnp.einsum("...ld,lkd->...lk", x, self.embedding)
        d2 = x2 - 2.0 * xe + e2
        return -d2 / (2.0 * self._variance())

    def _posterior_logits(self, value):
        x = self._features(value)
        if self.use_ar_posterior:
            x = self._ar_refine(x)
        return self._dist_logits(x)

    def _cont_loss(self, x, q):
        if self.distance_method == "vmf":
            xn = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), _EPS)
            qn = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
            return jnp.mean(jnp.sum(xn * (xn - qn), -1) / self._variance())
        # divide per element: variance broadcasts (L, 1) over (..., L, D)
        inv2v = 1.0 / (2.0 * self._variance())
        if self.separate_update_cont_loss:
            vq = jnp.mean(jnp.sum(
                (jax.lax.stop_gradient(x) - q) ** 2 * inv2v,
                -1)) * self.vq_loss_weight
            commit = jnp.mean(jnp.sum(
                (x - jax.lax.stop_gradient(q)) ** 2 * inv2v,
                -1)) * self.commit_loss_weight
            return vq + commit
        return jnp.mean(jnp.sum((x - q) ** 2 * inv2v, -1))

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        x = self._features(value)
        if self.use_ar_posterior:
            x = self._ar_refine(x)
        logits = self._dist_logits(x)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            onehot = gumbel_softmax_st(logits, rng, self.tau)
        else:
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=logits.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)

        prior_logits = self._prior_logits_from_feats(
            jax.lax.stop_gradient(q) if training else q)
        pmf = jax.nn.softmax(prior_logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)

        out_feats = q
        if training and self.straight_through:
            out_feats = (q * (1 - self.st_weight) + x * self.st_weight
                         + jax.lax.stop_gradient(
                             q * self.st_weight - x * self.st_weight))
        value_hat = out_feats.reshape(value.shape[:-1]
                                      + (self.out_channels,))
        post = jax.nn.softmax(logits, -1)
        avg = jnp.mean(post.reshape(-1, *post.shape[-2:]), 0)
        perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10), -1))
        out = {"value_hat": value_hat, "likelihood": lik,
               "metrics": {"perplexity": jnp.sum(perplexity),
                           "embedding_variance_mean": jnp.mean(
                               self._variance())}}
        if training:
            out["loss_vq"] = self.cont_loss_weight * self._cont_loss(x, q)
        return out

    def _prior_logits_from_feats(self, feats):
        return self._ar_prior_logits(feats)

    # -- EMA codebook update (reference :2045-2058) ---------------------------
    @staticmethod
    def ema_codebook_update(embedding, ema_count, ema_weight, x, onehot,
                            decay: float = 0.999, eps: float = 1e-5):
        """Pure functional EMA step. x: (N, L, D) inputs, onehot: (N, L, K)
        assignment probs/samples. Returns (embedding, ema_count, ema_weight).
        The host threads these arrays between train steps (the functional
        analog of the reference's buffer mutation)."""
        K = onehot.shape[-1]
        total = jnp.sum(onehot, axis=0)                        # (L, K)
        dw = jnp.einsum("nlk,nld->lkd", onehot, x)             # (L, K, D)
        ema_count = decay * ema_count + (1 - decay) * total
        n = jnp.sum(ema_count, -1, keepdims=True)
        ema_count = (ema_count + eps) / (n + K * eps) * n
        ema_weight = decay * ema_weight + (1 - decay) * dw
        embedding = ema_weight / ema_count[..., None]
        return embedding, ema_count, ema_weight

    # -- coding: symbols from distance logits ---------------------------------
    def symbols(self, value):
        return jnp.argmax(self._posterior_logits(value), -1).astype(jnp.int32)


class VQPriorStochasticVQARPriorCoder(StochasticVQARPriorCoder):
    """Prior logits from learned prior CODES scored against the codebook
    (reference :2316-2334): p(k) ∝ mean_p softmax(-d(prior_code_p, e_k));
    the AR net is bypassed."""

    num_prior_codes: int = 8

    def _setup_prior(self):
        # no AR net / unconditional logits: the prior derives from codes
        pass

    def _setup_extra(self):
        super()._setup_extra()
        self.prior_codes = self.param(
            "prior_codes", nn.initializers.normal(1.0),
            (self.latent_dims, self.num_prior_codes, self.embedding_dim))

    # The prior is STATIC — disable the inherited AR host-coding hooks so
    # the codec routes through the plain pmf_table path (graph_codec checks
    # `getattr(..., "host_encode", None) is not None`).
    host_encode = None
    host_decode = None

    def _prior_code_logits(self):
        """(L, K): mean over the P prior codes of their codebook logits."""
        x2 = jnp.sum(self.prior_codes ** 2, -1, keepdims=True)
        e2 = jnp.sum(self.embedding ** 2, -1)[:, None, :]
        xe = jnp.einsum("lpd,lkd->lpk", self.prior_codes, self.embedding)
        d2 = x2 - 2.0 * xe + e2
        return jax.nn.log_softmax(
            -d2 / (2.0 * jnp.reshape(self._variance(), (-1, 1, 1))),
            -1).mean(-2)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        prior_logits = self._prior_code_logits()
        x = self._features(value)
        if self.use_ar_posterior:
            x = self._ar_refine(x)
        logits = self._dist_logits(x)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            onehot = gumbel_softmax_st(logits, rng, self.tau)
        else:
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=logits.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)
        pmf = jax.nn.softmax(prior_logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        value_hat = q.reshape(value.shape[:-1] + (self.out_channels,))
        out = {"value_hat": value_hat, "likelihood": lik}
        if training:
            out["loss_vq"] = self.cont_loss_weight * self._cont_loss(x, q)
        return out

    def prior_pmf(self):
        return jax.nn.softmax(self._prior_code_logits(), -1)

    # static prior -> the plain (non-AR) coding protocol applies
    def pmf_table(self):
        pmf = self.prior_pmf()
        L, K = pmf.shape
        return (pmf, jnp.zeros((L,), jnp.float32),
                jnp.full((L,), K, jnp.int32), jnp.zeros((L,), jnp.int32))


class ContinuousToVQPriorCoder(PerChannelPMFCoder):
    """Gaussian VAE posterior blended with VQ quantization of its mean
    (reference ContinuousToVQDistributionPriorCoder :2744-2908).

    Input (..., 2*L*D) = (means, logvars). The forward sample interpolates
    continuous (reparameterized) and discrete (ST nearest-codeword) paths
    with weight relax_temp; the loss pairs the continuous KL (to N(0,1))
    scaled by relax_temp with quant/commit losses scaled by (1-relax_temp).
    Annealing relax_temp 1 -> 0 morphs a VAE into a VQ-VAE. Rate comes from
    the (EMA-trainable) discrete code prior.
    """

    latent_dims: int = 4
    num_embeddings: int = 16
    embedding_dim: int = 8
    commitment_cost: float = 0.25
    relax_temp: float = 0.5
    blend_mode: str = "interpolate"   # "interpolate" | "random"
    gs_temp: float = 0.5

    @property
    def in_channels(self) -> int:
        return 2 * self.latent_dims * self.embedding_dim

    @property
    def out_channels(self) -> int:
        return self.latent_dims * self.embedding_dim

    def setup(self):
        self.codebook = self.param(
            "codebook",
            nn.initializers.uniform(2.0 / self.num_embeddings),
            (self.latent_dims, self.num_embeddings, self.embedding_dim))
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings))

    def _moments(self, value):
        mean, logvar = jnp.split(value, 2, axis=-1)
        shape = mean.shape[:-1] + (self.latent_dims, self.embedding_dim)
        return mean.reshape(shape), logvar.reshape(shape)

    def _distances(self, x):
        x2 = jnp.sum(x ** 2, -1, keepdims=True)
        e2 = jnp.sum(self.codebook ** 2, -1)
        xe = jnp.einsum("...ld,lkd->...lk", x, self.codebook)
        return (x2 - 2.0 * xe + e2) / self.embedding_dim

    def _discrete(self, mean):
        d2 = self._distances(mean)
        onehot = jax.nn.one_hot(jnp.argmin(d2, -1), self.num_embeddings,
                                dtype=mean.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        # straight-through (reference discrete_sample straight_through=True)
        return onehot, mean + jax.lax.stop_gradient(q - mean)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, relax_temp=None):
        t = self.relax_temp if relax_temp is None else relax_temp
        mean, logvar = self._moments(value)
        onehot, q = self._discrete(mean)

        if training and rng is not None:
            rng, eps_rng, blend_rng = jax.random.split(rng, 3)
            cont = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                eps_rng, mean.shape, mean.dtype)
        else:
            blend_rng = None
            cont = mean
        if self.blend_mode == "random" and blend_rng is not None:
            # RelaxedBernoulli(gs_temp, probs=t) per element (:2899-2903)
            u = jax.random.uniform(blend_rng, cont.shape, cont.dtype,
                                   _EPS, 1.0 - _EPS)
            lg = (jnp.log(t + _EPS) - jnp.log1p(-t + _EPS)
                  + jnp.log(u) - jnp.log1p(-u))
            w = jax.nn.sigmoid(lg / self.gs_temp)
        else:
            w = t
        sample = cont * w + q * (1.0 - w)

        pmf = jax.nn.softmax(self.prior_logits, -1)
        lik_disc = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        # continuous rate (KL to N(0,1)) fades with relax_temp; the coded
        # discrete rate fades in (reference kl_divergence :2884-2891)
        kl_cont = 0.5 * jnp.sum(
            mean ** 2 + jnp.exp(logvar) - 1.0 - logvar, -1)
        lik = jnp.exp(-kl_cont * t) * lik_disc ** (1.0 - t)
        out = {"value_hat": sample.reshape(value.shape[:-1]
                                           + (self.out_channels,)),
               "likelihood": jnp.maximum(lik, _EPS),
               "metrics": {"code_usage": jnp.mean(jnp.max(onehot, -1))}}
        if training:
            qd = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
            loss_quant = jnp.mean((jax.lax.stop_gradient(mean) - qd) ** 2)
            loss_commit = jnp.mean((mean - jax.lax.stop_gradient(qd)) ** 2)
            out["loss_vq"] = (loss_quant
                              + self.commitment_cost * loss_commit
                              * (1.0 - t))
        return out

    # -- coding protocol (discrete path) --------------------------------------
    def pmf_table(self):
        pmf = jax.nn.softmax(self.prior_logits, -1)
        L, K = pmf.shape
        return (pmf, jnp.zeros((L,), jnp.float32),
                jnp.full((L,), K, jnp.int32), jnp.zeros((L,), jnp.int32))

    def symbols(self, value):
        mean, _ = self._moments(value)
        return jnp.argmin(self._distances(mean), -1).astype(jnp.int32)

    def dequantize(self, symbols):
        onehot = jax.nn.one_hot(symbols, self.num_embeddings,
                                dtype=jnp.float32)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        return q.reshape(symbols.shape[:-1] + (self.out_channels,))
