"""Continuous-relaxation and continuous-to-discrete prior coders.

Parity targets (reference prior_coder/__init__.py):
  * IGRCategoricalAutoregressivePriorDistributionPriorCoder (:2416) —
    invertible Gaussian reparameterization (Potapczynski et al. 2020):
    categorical relaxation via softmax++ of a Gaussian sample (instead of
    Gumbel-softmax).
  * ContinuousBernoulliAutoregressivePriorDistributionPriorCoder (:2335) —
    continuous-Bernoulli latents with an autoregressive prior over dims.
  * ContinuousToDiscreteDistributionPriorCoder (:2559) /
    GaussianC2DDistributionPriorCoder (:4772) — Gaussian continuous
    posterior whose sample is blended onto a table of discrete embeddings
    ("interpolate" blend); the discrete index is what gets ANS-coded.
  * GaussianC2VQDistributionPriorCoder (:4789) — same, but the index
    posterior comes from VQ distances rather than the prior PMF.
  * MultiLatentDistributionPriorCoder (:2542) — channel-split composition of
    several sub-coders.

TPU-first: every relaxation is a fused elementwise/matmul pipeline (no
host-side sampling); coding goes through the PerChannelPMFCoder rANS path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph.node_coders import PerChannelPMFCoder
from .categorical import CategoricalPriorCoder

_EPS = 1e-9


def igr_softmax_pp(y, tau: float):
    """softmax++: K-1 Gaussian coordinates -> K-simplex point with an
    explicit remainder category (IGR, arXiv:1912.09588)."""
    z = jnp.concatenate([y / tau, jnp.zeros(y.shape[:-1] + (1,), y.dtype)], -1)
    return jax.nn.softmax(z, axis=-1)


class IGRCategoricalPriorCoder(CategoricalPriorCoder):
    """Categorical prior coder relaxed via the invertible Gaussian
    reparameterization: posterior params are (mu, logvar) over K-1 logits;
    the training sample is softmax++((mu + sigma*eps)/tau) with a
    straight-through argmax. Deterministic argmax at eval/coding."""

    @property
    def in_channels(self) -> int:
        return self.latent_dims * 2 * (self.num_embeddings - 1)

    def _posterior_params(self, value):
        p = value.reshape(value.shape[:-1]
                          + (self.latent_dims, 2 * (self.num_embeddings - 1)))
        mu, logvar = jnp.split(p, 2, axis=-1)
        return mu, jnp.clip(logvar, -10.0, 10.0)

    def _posterior_logits(self, value):
        mu, _ = self._posterior_params(value)
        return jnp.concatenate(
            [mu, jnp.zeros(mu.shape[:-1] + (1,), mu.dtype)], -1)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        mu, logvar = self._posterior_params(value)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            rng, s_rng = jax.random.split(rng)
            y = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                s_rng, mu.shape, mu.dtype)
            soft = igr_softmax_pp(y, self.tau)
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), self.num_embeddings,
                                  dtype=soft.dtype)
            onehot = hard + soft - jax.lax.stop_gradient(soft)
        else:
            soft = igr_softmax_pp(mu, self.tau)
            onehot = jax.nn.one_hot(jnp.argmax(soft, -1),
                                    self.num_embeddings, dtype=mu.dtype)
        feats = self._embed(onehot, training, None)
        value_hat = feats.reshape(value.shape[:-1] + (self.out_channels,))
        pmf = self.prior_pmf()
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        return {"value_hat": value_hat, "likelihood": lik,
                "metrics": {"igr_scale": jnp.mean(jnp.exp(0.5 * logvar))}}


class IGRCategoricalARPriorCoder(IGRCategoricalPriorCoder):
    """IGR relaxation + autoregressive prior over the latent dims: the
    actual reference class is IGRCategoricalAutoregressivePriorDistribution-
    PriorCoder (:2416) — invertible-Gaussian sampling with the prior for
    dim i conditioned on sampled dims < i. Training teacher-forces the AR
    prior in one fused pass; coding decodes dim-by-dim with on-device
    per-element PMFs (the AutoregressiveCategoricalPriorCoder host loop)."""

    ar_hidden: int = 32

    def _setup_prior(self):
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings))
        self.ar_net = nn.Sequential([
            nn.Dense(self.ar_hidden), nn.leaky_relu,
            nn.Dense(self.num_embeddings),
        ])

    def _ar_prior_logits(self, feats):
        from .categorical import AutoregressiveCategoricalPriorCoder as _A
        return _A._ar_prior_logits(self, feats)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        mu, logvar = self._posterior_params(value)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            y = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
            soft = igr_softmax_pp(y, self.tau)
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), self.num_embeddings,
                                  dtype=soft.dtype)
            onehot = hard + soft - jax.lax.stop_gradient(soft)
        else:
            soft = igr_softmax_pp(mu, self.tau)
            onehot = jax.nn.one_hot(jnp.argmax(soft, -1),
                                    self.num_embeddings, dtype=mu.dtype)
        feats = self._embed(onehot, False, None)
        logits = self._ar_prior_logits(
            jax.lax.stop_gradient(feats) if training else feats)
        pmf = jax.nn.softmax(logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        value_hat = feats.reshape(value.shape[:-1] + (self.out_channels,))
        return {"value_hat": value_hat, "likelihood": lik}

    # coding: reuse the categorical AR host loop verbatim
    def ar_step_pmf(self, decoded_symbols, dim: int):
        from .categorical import AutoregressiveCategoricalPriorCoder as _A
        return _A.ar_step_pmf(self, decoded_symbols, dim)

    def host_encode(self, codec, node, value, prior, pair):
        from .categorical import AutoregressiveCategoricalPriorCoder as _A
        return _A.host_encode(self, codec, node, value, prior, pair)

    def host_decode(self, codec, node, stream, prior, shape, pair):
        from .categorical import AutoregressiveCategoricalPriorCoder as _A
        return _A.host_decode(self, codec, node, stream, prior, shape, pair)


class ContinuousBernoulliARPriorCoder(nn.Module):
    """L continuous-Bernoulli latents per position with an AR prior over the
    latent dims (variational-only coder: likelihood = exp(-KL) per element,
    so the graph bpp reads as the ELBO rate — __init__.py rate convention).

    CB(lambda) density: p(x) = C(lam) lam^x (1-lam)^(1-x) on [0,1]; the KL
    between two CBs is evaluated in closed form via logits, means and the
    log-normalizer (reference uses torch.distributions.ContinuousBernoulli).
    """

    latent_dims: int = 8
    ar_hidden: int = 32

    @property
    def in_channels(self) -> int:
        return self.latent_dims

    @property
    def out_channels(self) -> int:
        return self.latent_dims

    def setup(self):
        self.prior_logits_p = self.param(
            "prior_logits", nn.initializers.zeros, (self.latent_dims,))
        # Maps a causally-masked sample vector (L features) to one prior
        # logit; applied per dim with dim-specific masking (vectorized).
        self.ar_net = nn.Sequential([
            nn.Dense(self.ar_hidden), nn.leaky_relu,
            nn.Dense(1),
        ])

    @staticmethod
    def _log_norm(logits):
        """log C(lambda) for CB with the given logits (stable form):
        C = 2 atanh(1-2lam) / (1-2lam) for lam != 1/2, -> 2 at lam=1/2."""
        lam = jax.nn.sigmoid(logits)
        t = 1.0 - 2.0 * lam
        small = jnp.abs(t) < 1e-3
        safe_t = jnp.where(small, 1.0, t)
        c = 2.0 * jnp.arctanh(jnp.where(small, 0.0, safe_t)) / safe_t
        c = jnp.where(small, 2.0 + t ** 2 * (2.0 / 3.0), c)
        return jnp.log(c)

    @staticmethod
    def _mean(logits):
        """E[x] for CB(logits): lam/(2lam-1) + 1/(2 atanh(1-2lam))."""
        lam = jax.nn.sigmoid(logits)
        t = 2.0 * lam - 1.0
        small = jnp.abs(t) < 1e-3
        safe_t = jnp.where(small, 1.0, t)
        m = lam / safe_t - 1.0 / (2.0 * jnp.arctanh(safe_t))
        return jnp.where(small, 0.5 + t / 6.0, m)

    def _kl(self, q_logits, p_logits):
        """KL(q || p) for continuous Bernoullis via E_q[x](q_logit-p_logit)
        + logC_q - logC_p."""
        return (self._mean(q_logits) * (q_logits - p_logits)
                + self._log_norm(q_logits) - self._log_norm(p_logits))

    def _sample(self, logits, rng):
        """Inverse-CDF sample of CB(logits): u ~ U(0,1),
        x = log(1 + u(e^l - 1)) / l  (l = logits; -> u as l -> 0)."""
        u = jax.random.uniform(rng, logits.shape, logits.dtype, 1e-6, 1 - 1e-6)
        l = logits
        small = jnp.abs(l) < 1e-3
        safe_l = jnp.where(small, 1.0, l)
        x = jnp.log1p(u * jnp.expm1(safe_l)) / safe_l
        return jnp.clip(jnp.where(small, u, x), 0.0, 1.0)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        q_logits = value
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            x = self._sample(q_logits, rng)
        else:
            x = self._mean(q_logits)
        # AR prior: dim i conditioned on sampled dims < i (teacher forced in
        # one pass: ctx[..., i, :] = x masked to dims < i).
        L = self.latent_dims
        mask = (jnp.arange(L)[None, :] < jnp.arange(L)[:, None]).astype(x.dtype)
        ctx = jax.lax.stop_gradient(x)[..., None, :] * mask   # (..., L, L)
        p_logits = self.ar_net(ctx)[..., 0] + self.prior_logits_p
        kl = self._kl(q_logits, p_logits)
        lik = jnp.exp(-jnp.maximum(kl, 0.0))
        return {"value_hat": x, "likelihood": jnp.maximum(lik, _EPS)}


class ContinuousToDiscretePriorCoder(PerChannelPMFCoder):
    """Gaussian continuous posterior blended onto discrete embeddings.

    Training: z ~ N(mu, sigma²); the nearest discrete embedding e_k is chosen
    (ST) and the output interpolates (1-blend)·z + blend·e_k — the
    "interpolate" sample blend of the reference (:2563). Eval/coding snaps
    to e_k exactly; the index k is ANS-coded under a trainable discrete
    prior PMF. GaussianC2D parity (:4772)."""

    latent_dims: int = 4
    num_embeddings: int = 32
    embedding_dim: int = 8
    blend: float = 0.5
    discrete_prior_trainable: bool = True

    @property
    def in_channels(self) -> int:
        return self.latent_dims * 2 * self.embedding_dim

    @property
    def out_channels(self) -> int:
        return self.latent_dims * self.embedding_dim

    def setup(self):
        scale = 1.0 / self.num_embeddings  # reference init range (:2580)
        init = lambda key, shape: jax.random.uniform(
            key, shape, jnp.float32, -scale, scale)
        self.embedding = self.param(
            "embedding", init,
            (self.latent_dims, self.num_embeddings, self.embedding_dim))
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings))

    def _posterior(self, value):
        p = value.reshape(value.shape[:-1]
                          + (self.latent_dims, 2 * self.embedding_dim))
        mu, logvar = jnp.split(p, 2, axis=-1)
        return mu, jnp.clip(logvar, -10.0, 10.0)

    def _distances(self, z):
        x2 = jnp.sum(z ** 2, -1, keepdims=True)
        e2 = jnp.sum(self.embedding ** 2, -1)
        xe = jnp.einsum("...ld,lkd->...lk", z, self.embedding)
        return x2 - 2.0 * xe + e2

    def _index_logits(self, z):
        return -self._distances(z)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        mu, logvar = self._posterior(value)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        else:
            z = mu
        logits = self._index_logits(z)
        onehot = jax.nn.one_hot(jnp.argmax(logits, -1), self.num_embeddings,
                                dtype=z.dtype)
        e = jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)
        if training:
            out_feats = (1.0 - self.blend) * z + self.blend * e
        else:
            out_feats = e
        value_hat = out_feats.reshape(value.shape[:-1] + (self.out_channels,))
        pmf = jax.nn.softmax(self.prior_logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        out = {"value_hat": value_hat, "likelihood": lik}
        if training:
            # pull embeddings toward the continuous samples they absorb
            out["loss_c2d"] = jnp.mean((jax.lax.stop_gradient(z) - e) ** 2) \
                + 0.25 * jnp.mean((z - jax.lax.stop_gradient(e)) ** 2)
        return out

    # -- PerChannelPMFCoder protocol -------------------------------------------
    def pmf_table(self):
        pmf = jax.nn.softmax(self.prior_logits, -1)
        L, K = pmf.shape
        return (pmf, jnp.zeros((L,), jnp.float32),
                jnp.full((L,), K, jnp.int32), jnp.zeros((L,), jnp.int32))

    def symbols(self, value):
        mu, _ = self._posterior(value)
        return jnp.argmax(self._index_logits(mu), -1).astype(jnp.int32)

    def dequantize(self, symbols):
        onehot = jax.nn.one_hot(symbols, self.num_embeddings,
                                dtype=jnp.float32)
        e = jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)
        return e.reshape(symbols.shape[:-1] + (self.out_channels,))


class GaussianC2VQPriorCoder(ContinuousToDiscretePriorCoder):
    """C2D variant whose index choice is sampled from the VQ distance
    posterior (ST-Gumbel) during training — reference
    GaussianC2VQDistributionPriorCoder (:4789)."""

    posterior_temp: float = 1.0

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        if not training:
            return super().__call__(value, prior, training, rng)
        if rng is None:
            raise ValueError("training forward needs rng")
        from .categorical import gumbel_softmax_st
        rng, z_rng, g_rng = jax.random.split(rng, 3)
        mu, logvar = self._posterior(value)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
            z_rng, mu.shape, mu.dtype)
        logits = self._index_logits(z) / self.posterior_temp
        onehot = gumbel_softmax_st(logits, g_rng, 1.0)
        e = jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)
        blended = (1.0 - self.blend) * z + self.blend * e
        value_hat = blended.reshape(value.shape[:-1] + (self.out_channels,))
        pmf = jax.nn.softmax(self.prior_logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        return {"value_hat": value_hat, "likelihood": lik,
                "loss_c2d": jnp.mean((jax.lax.stop_gradient(z) - e) ** 2)
                + 0.25 * jnp.mean((z - jax.lax.stop_gradient(e)) ** 2)}


class MultiLatentPriorCoder(nn.Module):
    """Channel-split composition of sub-coders: the input feature splits
    into per-coder channel slices, outputs/likelihoods concatenate
    (reference MultiLatentDistributionPriorCoder :2542)."""

    coders: Sequence[nn.Module]
    split_sizes: Sequence[int]

    @property
    def out_channels(self) -> int:
        return sum(c.out_channels for c in self.coders)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        rngs = (jax.random.split(rng, len(self.coders))
                if rng is not None else [None] * len(self.coders))
        splits = np.cumsum(np.asarray(self.split_sizes))[:-1]
        parts = jnp.split(value, splits, axis=-1)
        outs, liks, hats = {}, [], []
        for i, (coder, part) in enumerate(zip(self.coders, parts)):
            o = coder(part, prior=prior, training=training, rng=rngs[i])
            hats.append(o["value_hat"])
            if o.get("likelihood") is not None:
                liks.append(o["likelihood"].reshape(
                    (o["likelihood"].shape[0], -1)))
            for k, v in o.items():
                if k.startswith("loss_"):
                    outs[k] = outs.get(k, 0.0) + v
        outs["value_hat"] = jnp.concatenate(hats, -1)
        outs["likelihood"] = (jnp.concatenate(liks, -1) if liks else None)
        return outs
