"""Categorical-family prior coders.

Parity targets (reference prior_coder/__init__.py):
  * CategoricalDistributionPriorCoder (:2946) — L categorical latents per
    position, Gumbel-softmax straight-through training, learned
    unconditional prior PMF, ANS-coded indices.
  * GaussianEmbeddingCategoricalPriorCoder (:619, :4434-4529) — categories
    are Gaussian embeddings (mean + learned scale noise while training).
  * StickBreakingPriorCategoricalDistributionPriorCoder / GEM (:4530-4636) —
    prior PMF built from Kumaraswamy stick-breaking fractions.
  * CategoricalAutoregressivePriorDistributionPriorCoder (:931-1877) —
    prior for latent dim i conditioned on sampled dims < i.

TPU-first: training is one fused forward (ST-Gumbel sampling, mixture
embeddings); coding uses static per-dim PMF tables through the standard
PerChannelPMFCoder rANS path (the AR variant re-derives per-element PMFs on
device per step, coded with a host loop over the L latent dims).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph.node_coders import PerChannelPMFCoder
from ..nn import mc_estimators

_EPS = 1e-9


def gumbel_softmax_st(logits, rng, tau: float):
    """Straight-through Gumbel-softmax: hard one-hot forward, relaxed grad."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(soft, -1), logits.shape[-1],
                          dtype=logits.dtype)
    return hard + soft - jax.lax.stop_gradient(soft)


class CategoricalPriorCoder(PerChannelPMFCoder):
    """L independent categorical latents per position with a learned
    unconditional prior PMF per latent dim; rate = -log2 p_prior(index)."""

    latent_dims: int = 4          # L symbol planes
    num_embeddings: int = 16      # K categories
    embedding_dim: int = 8        # D output features per plane
    tau: float = 1.0
    # Optional score-function extra on top of the ST relaxation:
    # "none" | "reinforce" | "vimco" (reference MC-sampled training).
    mc_estimator: str = "none"
    mc_samples: int = 4
    mc_loss_weight: float = 1.0

    @property
    def in_channels(self) -> int:
        return self.latent_dims * self.num_embeddings

    @property
    def out_channels(self) -> int:
        return self.latent_dims * self.embedding_dim

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.latent_dims, self.num_embeddings, self.embedding_dim))
        self._setup_prior()
        self._setup_extra()

    def _setup_prior(self):
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings))

    def _setup_extra(self):
        pass

    # -- prior / embedding hooks (overridden by subclasses) -------------------
    def prior_pmf(self) -> jnp.ndarray:
        """(L, K) prior PMF rows."""
        return jax.nn.softmax(self.prior_logits, axis=-1)

    def _training_prior_pmf(self, rng) -> jnp.ndarray:
        """Training-time prior PMF; subclasses with a STOCHASTIC prior
        (reference's per-forward _resample_prior, :4540) override this —
        coding stays on the deterministic prior_pmf() tables."""
        return self.prior_pmf()

    def _embed(self, onehot, training: bool, rng):
        """(..., L, K) one-hot/relaxed weights -> (..., L, D) features."""
        return jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)

    # -- training forward ------------------------------------------------------
    def _posterior_logits(self, value):
        return value.reshape(value.shape[:-1]
                             + (self.latent_dims, self.num_embeddings))

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        logits = self._posterior_logits(value)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            rng, st_rng, emb_rng, mc_rng, pr_rng = jax.random.split(rng, 5)
            onehot = gumbel_softmax_st(logits, st_rng, self.tau)
        else:
            emb_rng = mc_rng = pr_rng = None
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=logits.dtype)
        feats = self._embed(onehot, training, emb_rng)
        value_hat = feats.reshape(value.shape[:-1] + (self.out_channels,))

        pmf = (self._training_prior_pmf(pr_rng) if training
               else self.prior_pmf())
        lik = jnp.sum(onehot * pmf, axis=-1)
        lik = jnp.maximum(lik, _EPS)

        out = {"value_hat": value_hat, "likelihood": lik,
               "metrics": {"code_usage": jnp.mean(
                   jnp.max(jax.nn.softmax(logits, -1), -1))}}
        if training and self.mc_estimator != "none":
            out["loss_mc"] = self.mc_loss_weight * self._mc_loss(
                logits, pmf, mc_rng)
        return out

    def _mc_loss(self, logits, pmf, rng):
        """Score-function rate estimator: K hard samples, weight = prior
        log-likelihood of the sample (the coding objective)."""
        K = self.mc_samples
        logp_post = jax.nn.log_softmax(logits, -1)
        g = jax.random.gumbel(rng, (K,) + logits.shape, logits.dtype)
        samples = jnp.argmax(logits[None] + g, -1)          # (K, N, ..., L)
        logp_prior = jnp.log(jnp.maximum(pmf, _EPS))
        red = tuple(range(2, samples.ndim))                  # all but (K, N)

        def gather(table, idx):
            # table (..., L, K) broadcast / (L, K); idx (K, N, ..., L)
            t = jnp.broadcast_to(table, idx.shape + (self.num_embeddings,)) \
                if table.ndim == 2 else table
            return jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]

        log_w = jnp.sum(gather(logp_prior, samples), axis=red).T   # (N, K)
        log_q = jnp.sum(gather(jnp.broadcast_to(
            logp_post[None], samples.shape + (self.num_embeddings,)), samples),
            axis=red).T
        return mc_estimators.mc_loss(
            self.mc_estimator if self.mc_estimator != "none" else "vimco",
            log_w, log_q, K)

    # -- PerChannelPMFCoder coding protocol ------------------------------------
    def pmf_table(self):
        pmf = self.prior_pmf()
        L, K = pmf.shape
        lengths = jnp.full((L,), K, jnp.int32)
        tail = jnp.full((L,), 0.0, jnp.float32)
        offsets = jnp.zeros((L,), jnp.int32)
        return pmf, tail, lengths, offsets

    def symbols(self, value):
        return jnp.argmax(self._posterior_logits(value), -1).astype(jnp.int32)

    def dequantize(self, symbols):
        onehot = jax.nn.one_hot(symbols, self.num_embeddings, dtype=jnp.float32)
        feats = self._embed(onehot, False, None)
        return feats.reshape(symbols.shape[:-1] + (self.out_channels,))


class GaussianEmbeddingCategoricalPriorCoder(CategoricalPriorCoder):
    """Categories are Gaussian embeddings: training adds learned-scale noise
    to the selected embedding (reference :619, :4434)."""

    init_log_scale: float = -2.0

    def _setup_extra(self):
        self.log_scales = self.param(
            "log_scales",
            nn.initializers.constant(self.init_log_scale),
            (self.latent_dims, self.num_embeddings, self.embedding_dim))

    def _embed(self, onehot, training: bool, rng):
        means = jnp.einsum("...lk,lkd->...ld", onehot, self.embedding)
        if training and rng is not None:
            scales = jnp.einsum("...lk,lkd->...ld", onehot,
                                jnp.exp(self.log_scales))
            means = means + scales * jax.random.normal(
                rng, means.shape, means.dtype)
        return means


class StickBreakingPriorCoder(CategoricalPriorCoder):
    """GEM stick-breaking prior: PMF from K-1 learned Kumaraswamy stick
    fractions (reference StickBreakingGEMPriorCoder :4561)."""

    def _setup_prior(self):
        # raw (a, b) Kumaraswamy concentration per stick.
        self.stick_a = self.param(
            "stick_a", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings - 1))
        self.stick_b = self.param(
            "stick_b", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings - 1))

    def prior_pmf(self) -> jnp.ndarray:
        from ..nn.distributions import kumaraswamy_mean
        a = nn.softplus(self.stick_a) + 1e-3
        b = nn.softplus(self.stick_b) + 1e-3
        v = jnp.clip(kumaraswamy_mean(a, b), 1e-6, 1.0 - 1e-6)  # (L, K-1)
        rem = jnp.concatenate(
            [jnp.ones(v.shape[:-1] + (1,)),
             jnp.cumprod(1.0 - v, axis=-1)], -1)                 # (L, K)
        pmf = rem * jnp.concatenate(
            [v, jnp.ones(v.shape[:-1] + (1,))], -1)
        return pmf / jnp.sum(pmf, -1, keepdims=True)


class ResampledStickBreakingCategoricalPriorCoder(CategoricalPriorCoder):
    """Dirichlet-process-flavored categorical prior: the per-forward prior
    PMF is RESAMPLED from a Beta(1, softplus(alpha)) stick-breaking process
    with learned concentration alpha per stick (reference
    StickBreakingPriorCategoricalDistributionPriorCoder :4530-4560,
    whose _resample_prior runs before every training iteration).

    TPU-native adaptation: the resample is a traced per-step draw (no
    host-side buffer mutation); coding uses the DETERMINISTIC expected
    stick PMF (Beta(1, b) mean = 1/(1+b)) so pmf_table() — and therefore
    the bitstream — is reproducible, while training sees the reference's
    stochastic-prior regularization."""

    prior_alpha0: float = 5.0

    def _setup_prior(self):
        a_val = float(np.log(np.exp(self.prior_alpha0) - 1.0))
        self.prior_logprob = self.param(
            "prior_logprob", nn.initializers.constant(a_val),
            (self.latent_dims, self.num_embeddings))

    def _stick_pmf(self, v):
        # GEM construction: p_k = v_k * prod_{j<k}(1 - v_j), renormalized.
        v = jnp.clip(v, 1e-6, 1.0 - 1e-6)
        rem = jnp.concatenate(
            [jnp.ones(v.shape[:-1] + (1,)),
             jnp.cumprod(1.0 - v[..., :-1], axis=-1)], -1)
        pmf = rem * v
        return pmf / jnp.sum(pmf, -1, keepdims=True)

    def prior_pmf(self) -> jnp.ndarray:
        b = nn.softplus(self.prior_logprob)
        return self._stick_pmf(1.0 / (1.0 + b))  # E[Beta(1, b)]

    def _training_prior_pmf(self, rng) -> jnp.ndarray:
        b = nn.softplus(self.prior_logprob)
        # Beta(1, b) sample via inverse CDF: 1 - u^(1/b) (reparameterized,
        # so alpha receives pathwise gradients as in the reference rsample).
        u = jax.random.uniform(rng, b.shape, b.dtype, 1e-6, 1.0 - 1e-6)
        return self._stick_pmf(1.0 - u ** (1.0 / jnp.maximum(b, 1e-6)))


class AutoregressiveCategoricalPriorCoder(CategoricalPriorCoder):
    """Prior for latent dim i conditioned on the sampled dims < i through a
    shared MLP over the causally-masked embedded sample + dim one-hot
    (reference CategoricalAutoregressivePriorDistributionPriorCoder :1149).

    Training is one fused pass (teacher-forced causal masking, vmapped over
    dims); real coding decodes dim-by-dim — per-element PMFs are produced
    on device and coded via per-element CDF rows on the host (L short steps).
    """

    ar_hidden: int = 32

    def _setup_prior(self):
        self.prior_logits = self.param(
            "prior_logits", nn.initializers.zeros,
            (self.latent_dims, self.num_embeddings))  # dim-0 / fallback
        self.ar_net = nn.Sequential([
            nn.Dense(self.ar_hidden), nn.leaky_relu,
            nn.Dense(self.num_embeddings),
        ])

    def _ar_prior_logits(self, feats):
        """feats: (..., L, D) embedded samples -> per-dim prior logits
        (..., L, K); dim i sees dims < i only."""
        L = self.latent_dims
        flat = feats.reshape(feats.shape[:-2] + (L * feats.shape[-1],))

        def one_dim(i):
            mask = jnp.repeat(jnp.arange(L) < i, feats.shape[-1]).astype(
                flat.dtype)
            pos = jnp.broadcast_to(
                jax.nn.one_hot(i, L, dtype=flat.dtype),
                flat.shape[:-1] + (L,))
            inp = jnp.concatenate([flat * mask, pos], -1)
            return self.ar_net(inp) + self.prior_logits[i]

        logits = jnp.stack([one_dim(i) for i in range(L)], axis=-2)
        return logits

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        logits = self._posterior_logits(value)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            onehot = gumbel_softmax_st(logits, rng, self.tau)
        else:
            onehot = jax.nn.one_hot(jnp.argmax(logits, -1),
                                    self.num_embeddings, dtype=logits.dtype)
        feats = self._embed(onehot, False, None)
        prior_logits = self._ar_prior_logits(jax.lax.stop_gradient(feats)
                                             if training else feats)
        pmf = jax.nn.softmax(prior_logits, -1)
        lik = jnp.maximum(jnp.sum(onehot * pmf, -1), _EPS)
        value_hat = feats.reshape(value.shape[:-1] + (self.out_channels,))
        return {"value_hat": value_hat, "likelihood": lik}

    # -- coding helpers (host AR loop; per-element PMFs) -----------------------
    def ar_step_pmf(self, decoded_symbols, dim: int):
        """PMF rows for dim `dim` given already-decoded dims (as symbols,
        (..., L) int32 with dims >= dim arbitrary): (..., K) float."""
        onehot = jax.nn.one_hot(decoded_symbols, self.num_embeddings,
                                dtype=jnp.float32)
        feats = self._embed(onehot, False, None)
        logits = self._ar_prior_logits(feats)
        return jax.nn.softmax(logits[..., dim, :], -1)

    def host_encode(self, codec, node, value, prior, pair):
        import numpy as onp
        from ..nn.entropy_models import export_cdf_tables

        syms = onp.asarray(codec._node_fn(codec.params, node, "symbols", value))
        streams = []
        for i in range(self.latent_dims):
            pmf = onp.asarray(codec._node_fn(
                codec.params, node, "ar_step_pmf", jnp.asarray(syms), i))
            rows = pmf.reshape(-1, self.num_embeddings)
            cdfs, sizes, offs = export_cdf_tables(
                rows, onp.zeros(rows.shape[0]),
                onp.full(rows.shape[0], self.num_embeddings),
                onp.zeros(rows.shape[0], onp.int32))
            from ..coding.rans import Rans64Encoder
            enc = Rans64Encoder(bypass_coding=True)
            enc.init_cdf_params(cdfs, sizes, offs)
            idx = onp.arange(rows.shape[0], dtype=onp.int32)
            streams.append(enc.encode_with_indexes(
                syms[..., i].reshape(-1), idx))
        from ..utils.bytes_ops import merge_bytes
        decoded = codec._node_fn(codec.params, node, "dequantize",
                                 jnp.asarray(syms))
        return merge_bytes(streams, num_segments=self.latent_dims), decoded

    def host_decode(self, codec, node, stream, prior, shape, pair):
        import numpy as onp
        from ..nn.entropy_models import export_cdf_tables
        from ..utils.bytes_ops import split_merged_bytes
        from ..coding.rans import Rans64Decoder

        streams = split_merged_bytes(stream, num_segments=self.latent_dims)
        syms = onp.zeros(shape, onp.int32)
        for i in range(self.latent_dims):
            pmf = onp.asarray(codec._node_fn(
                codec.params, node, "ar_step_pmf", jnp.asarray(syms), i))
            rows = pmf.reshape(-1, self.num_embeddings)
            cdfs, sizes, offs = export_cdf_tables(
                rows, onp.zeros(rows.shape[0]),
                onp.full(rows.shape[0], self.num_embeddings),
                onp.zeros(rows.shape[0], onp.int32))
            dec = Rans64Decoder(bypass_coding=True)
            dec.init_cdf_params(cdfs, sizes, offs)
            idx = onp.arange(rows.shape[0], dtype=onp.int32)
            syms[..., i] = dec.decode_with_indexes(
                streams[i], idx).reshape(shape[:-1])
        return codec._node_fn(codec.params, node, "dequantize",
                              jnp.asarray(syms))
