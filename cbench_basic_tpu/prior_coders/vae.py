"""Variational (continuous) prior coders — rate = KL, used for entropy
estimation / training and for bits-back (BB-ANS) coding stacks.

Parity targets (reference prior_coder/__init__.py):
  * GaussianPriorCoder (:361) — diagonal-Gaussian posterior vs N(0,1) or a
    conditioned prior; closed-form KL.
  * BetaBernoulliGaussianPriorCoder (:4637) — spike-and-slab: Bernoulli
    gates (relaxed-ST) over Gaussian values, with a Beta hyperprior on the
    learned gate probabilities.

Like the reference (whose `_encode_transformed` raises — variational priors
are not directly encodable, DistributionPriorCoder :774), these coders
return likelihood = exp(-KL per element) so the graph's bpp reads the ELBO
rate; real coding goes through the BB-ANS stack (codecs/bbans.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def gaussian_kl(mu_q, logvar_q, mu_p=None, logvar_p=None):
    """Elementwise KL(N(mu_q, e^logvar_q) || N(mu_p, e^logvar_p)); prior
    defaults to N(0, 1)."""
    if mu_p is None:
        mu_p = jnp.zeros_like(mu_q)
    if logvar_p is None:
        logvar_p = jnp.zeros_like(logvar_q)
    return 0.5 * (logvar_p - logvar_q
                  + (jnp.exp(logvar_q) + (mu_q - mu_p) ** 2)
                  / jnp.exp(logvar_p) - 1.0)


class GaussianPriorCoder(nn.Module):
    """Diagonal-Gaussian VAE latent: value carries (mu, logvar) in 2C
    channels; `prior`, when given, carries the conditional prior's
    (mu, logvar)."""

    channels: int
    logvar_bound: float = 10.0

    def _posterior(self, value):
        mu, logvar = jnp.split(value, 2, axis=-1)
        return mu, jnp.clip(logvar, -self.logvar_bound, self.logvar_bound)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        mu, logvar = self._posterior(value)
        if prior is not None:
            mu_p, logvar_p = self._posterior(prior)
        else:
            mu_p = logvar_p = None
        kl = gaussian_kl(mu, logvar, mu_p, logvar_p)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        else:
            z = mu
        return {"value_hat": z,
                "likelihood": jnp.exp(-kl),
                "metrics": {"kl_nats": jnp.sum(kl) / mu.shape[0]}}


class GaussianMixturePriorCoder(nn.Module):
    """Diagonal-Gaussian posterior against a SCALAR mixture-of-Gaussians
    prior with data-settable (VAMP) components — reference
    GaussianDistributionPriorCoder (:2909-2945): prior_means/prior_scales
    buffers (init: one standard-normal component), a MixtureSameFamily
    prior when unconditioned, posterior-form prior when a `prior` feature
    is given, and set_vamp_posterior installing components from encoded
    pseudo-inputs.

    TPU-native: the component table is a fixed-size (static-shape) param
    pair — torch's resizable buffers would force recompilation per vamp
    update under jit — updated FUNCTIONALLY by set_vamp_posterior (returns
    the new leaves; the caller installs them into the params tree). The
    mixture rate is a single-sample pathwise MC estimate
    log q(z) - log p_mix(z) at the sampled z (the mixture KL has no
    closed form), matching the ELBO the reference optimizes."""

    channels: int
    num_prior_components: int = 1
    logvar_bound: float = 10.0

    def setup(self):
        K = self.num_prior_components
        self.prior_means = self.param(
            "prior_means", nn.initializers.zeros, (K,))
        self.prior_log_scales = self.param(
            "prior_log_scales", nn.initializers.zeros, (K,))

    def _posterior(self, value):
        mu, logvar = jnp.split(value, 2, axis=-1)
        return mu, jnp.clip(logvar, -self.logvar_bound, self.logvar_bound)

    @staticmethod
    def _normal_logpdf(z, mean, scale):
        return (-0.5 * ((z - mean) / scale) ** 2
                - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi))

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
        if prior is not None:
            # conditioned prior arrives in posterior form (ref :2921)
            mu_p, logvar_p = self._posterior(prior)
            kl = gaussian_kl(mu, logvar, mu_p, logvar_p)
        else:
            means = self.prior_means                # (K,)
            scales = jnp.maximum(jnp.exp(self.prior_log_scales), 1e-6)
            log_p = jax.nn.logsumexp(
                self._normal_logpdf(z[..., None], means, scales)
                - jnp.log(means.shape[0]), axis=-1)
            log_q = self._normal_logpdf(z, mu, jnp.exp(0.5 * logvar))
            kl = log_q - log_p                      # single-sample MC KL
        return {"value_hat": z,
                "likelihood": jnp.exp(-jnp.clip(kl, -30.0, 30.0)),
                "metrics": {"kl_nats": jnp.sum(kl) / mu.shape[0]}}

    def set_vamp_posterior(self, posterior):
        """Mixture components from encoded pseudo-inputs (ref :2934-2944,
        whose buffers take one scalar (mean, scale) per posterior element).
        Static-shape analog: the first num_prior_components elements become
        the components. Returns {"prior_means", "prior_log_scales"} leaves
        for the caller to install into its params tree (functional — no
        in-place buffer mutation under jit)."""
        mu, logvar = self._posterior(posterior)
        K = self.num_prior_components
        flat_mu = mu.reshape(-1)
        flat_ls = 0.5 * logvar.reshape(-1)
        if flat_mu.shape[0] < K:
            raise ValueError(
                f"need >= {K} posterior elements for {K} components, "
                f"got {flat_mu.shape[0]}")
        return {"prior_means": flat_mu[:K], "prior_log_scales": flat_ls[:K]}


class BetaBernoulliGaussianPriorCoder(nn.Module):
    """Spike-and-slab latent: value carries (gate_logit, mu, logvar) in 3C
    channels. Gates are relaxed-ST Bernoulli; the learned per-channel prior
    gate probability carries a Beta(alpha0, beta0) hyperprior loss
    (reference :4637 — sparsity-inducing beta-Bernoulli process prior)."""

    channels: int
    alpha0: float = 1.0
    beta0: float = 3.0
    beta_loss_weight: float = 1e-3
    logvar_bound: float = 10.0

    def setup(self):
        self.prior_gate_logit = self.param(
            "prior_gate_logit", nn.initializers.zeros, (self.channels,))

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        gate_logit, mu, logvar = jnp.split(value, 3, axis=-1)
        logvar = jnp.clip(logvar, -self.logvar_bound, self.logvar_bound)
        q_gate = jax.nn.sigmoid(gate_logit)
        p_gate = jnp.clip(jax.nn.sigmoid(self.prior_gate_logit), 1e-6,
                          1.0 - 1e-6)

        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            g_rng, z_rng = jax.random.split(rng)
            u = jax.random.uniform(g_rng, q_gate.shape)
            hard = (u < q_gate).astype(mu.dtype)
            gates = hard + q_gate - jax.lax.stop_gradient(q_gate)
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                z_rng, mu.shape, mu.dtype)
        else:
            gates = (q_gate > 0.5).astype(mu.dtype)
            z = mu

        # KL(Bern(q)||Bern(p)) + q * KL(N(mu, s)||N(0, 1)) per element.
        qc = jnp.clip(q_gate, 1e-6, 1.0 - 1e-6)
        kl_gate = (qc * jnp.log(qc / p_gate)
                   + (1 - qc) * jnp.log((1 - qc) / (1 - p_gate)))
        kl = kl_gate + qc * gaussian_kl(mu, logvar)

        # Beta hyperprior on the learned gate probabilities.
        loss_beta = -jnp.mean((self.alpha0 - 1) * jnp.log(p_gate)
                              + (self.beta0 - 1) * jnp.log1p(-p_gate))

        out = {"value_hat": gates * z,
               "likelihood": jnp.exp(-kl),
               "metrics": {"gate_rate": jnp.mean(q_gate)}}
        if training:
            out["loss_beta"] = self.beta_loss_weight * loss_beta
        return out
