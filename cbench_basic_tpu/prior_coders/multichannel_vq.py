"""Full-featured multi-channel VQ prior coder.

Parity target: MultiChannelVQPriorCoder (reference
prior_coder/__init__.py:4873-5894) — the reference's most-configured VQ:
per-channel codebooks (optionally shared), learned code-frequency prior,
relaxed/ST-Gumbel stochastic assignment, input/embedding smoothing noise,
entropy temperature, and an optional autoregressive index prior
(ar_method="finitestate" over previous channels) that is ANS-coded
channel-by-channel.

TPU-first: one batched distance matmul for all channels' assignments; the
AR prior trains teacher-forced in a single fused pass (per-channel MLPs
vmapped) and codes with an L-step host loop re-deriving per-element PMFs on
device — L is the channel count (small), not the spatial size, so the loop
stays short. EMA codebook updates are replaced by gradient codebooks +
commitment (keeps the train step pure; same fixed points, see Sonderby'17).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .categorical import gumbel_softmax_st
from .vq import VQPriorCoder

_EPS = 1e-9


class MultiChannelVQPriorCoder(VQPriorCoder):
    """L channel groups, each VQ-quantized against its own (or a shared)
    codebook, indices coded under a learned, optionally autoregressive prior.

    Config axes mirrored from the reference signature (:4874-4921):
      channels_share_codebook, use_code_freq (learned index prior),
      use_st_gumbel + relax_temp (stochastic assignment),
      input_variance / embedding_variance (smoothing noise),
      entropy_temp (rate tempering), use_autoregressive_prior + ar_hidden
      (finite-state channel-AR prior).
    """

    channels_share_codebook: bool = False
    use_code_freq: bool = True
    use_st_gumbel: bool = False
    relax_temp: float = 1.0
    input_variance: float = 0.0
    embedding_variance: float = 0.0
    entropy_temp: float = 1.0
    use_autoregressive_prior: bool = False
    ar_hidden: int = 48

    def setup(self):
        rows = 1 if self.channels_share_codebook else self.num_groups
        scale = 1.0 / self.num_embeddings  # reference init range (:4949)
        init = lambda key, shape: jax.random.uniform(
            key, shape, jnp.float32, -scale, scale)
        self.codebook_rows = self.param(
            "codebook", init, (rows, self.num_embeddings, self.embedding_dim))
        if self.use_code_freq:
            self.prior_logits = self.param(
                "prior_logits", nn.initializers.zeros,
                (self.num_groups, self.num_embeddings))
        if self.embedding_variance > 0:
            self.emb_logvar = self.param(
                "emb_logvar",
                nn.initializers.constant(float(np.log(self.embedding_variance))),
                (rows, self.num_embeddings, self.embedding_dim))
        if self.use_autoregressive_prior:
            # Per-channel finite-state MLP: embedded previous channels +
            # channel one-hot -> index logits (ar_mlp_per_channel=True
            # realized as one shared MLP with a channel-id input).
            self.ar_net = nn.Sequential([
                nn.Dense(self.ar_hidden), nn.leaky_relu,
                nn.Dense(self.ar_hidden), nn.leaky_relu,
                nn.Dense(self.num_embeddings),
            ])

    @property
    def codebook(self):
        cb = self.codebook_rows
        if self.channels_share_codebook:
            cb = jnp.broadcast_to(cb, (self.num_groups,) + cb.shape[1:])
        return cb

    def _static_prior_logits(self):
        if self.use_code_freq:
            return jax.nn.log_softmax(self.prior_logits, -1)
        return jnp.full((self.num_groups, self.num_embeddings),
                        -float(np.log(self.num_embeddings)))

    def _ar_prior_logits(self, feats):
        """feats (..., L, D) embedded decoded indices -> per-channel prior
        logits (..., L, K); channel i sees channels < i only (causal mask),
        teacher-forced in one pass."""
        L, D = self.num_groups, self.embedding_dim
        flat = feats.reshape(feats.shape[:-2] + (L * D,))

        def one_dim(i):
            mask = jnp.repeat(jnp.arange(L) < i, D).astype(flat.dtype)
            pos = jnp.broadcast_to(jax.nn.one_hot(i, L, dtype=flat.dtype),
                                   flat.shape[:-1] + (L,))
            return self.ar_net(jnp.concatenate([flat * mask, pos], -1))

        base = self._static_prior_logits()
        return jnp.stack([one_dim(i) + base[i] for i in range(L)], axis=-2)

    def _assign(self, x, training: bool, rng):
        if training and self.input_variance > 0 and rng is not None:
            rng, n_rng = jax.random.split(rng)
            x = x + self.input_variance * jax.random.normal(
                n_rng, x.shape, x.dtype)
        d2 = self._distances(x)
        if training and self.use_st_gumbel and rng is not None:
            rng, g_rng = jax.random.split(rng)
            onehot = gumbel_softmax_st(-d2 / self.relax_temp, g_rng, 1.0)
        else:
            onehot = jax.nn.one_hot(jnp.argmin(d2, -1), self.num_embeddings,
                                    dtype=x.dtype)
        q = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        if training and self.embedding_variance > 0 and rng is not None:
            std = jnp.einsum("...lk,lkd->...ld", onehot,
                             jnp.exp(0.5 * self.emb_logvar))
            q = q + std * jax.random.normal(rng, q.shape, q.dtype)
        return onehot, q, {}

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        x = self._split(value)
        onehot, q, aux = self._assign(x, training, rng)
        value_hat = (x + jax.lax.stop_gradient(q - x)).reshape(
            value.shape[:-1] + (self.out_channels,))
        if self.use_autoregressive_prior:
            feats = jnp.einsum("...lk,lkd->...ld",
                               jax.lax.stop_gradient(onehot), self.codebook)
            logp = jax.nn.log_softmax(self._ar_prior_logits(feats), -1)
        else:
            logp = jax.nn.log_softmax(
                jnp.broadcast_to(self._static_prior_logits(),
                                 onehot.shape), -1)
        loglik = jnp.sum(onehot * logp, -1) / self.entropy_temp
        lik = jnp.maximum(jnp.exp(loglik), _EPS)
        out = {"value_hat": value_hat, "likelihood": lik,
               "metrics": {"codebook_usage": jnp.mean(jnp.max(onehot, -1))}}
        if training:
            out.update(self._extra_losses(x, q, onehot, aux))
        return out

    # -- coding ------------------------------------------------------------------
    # Static prior: the PerChannelPMFCoder path (pmf_table from VQPriorCoder
    # via prior logits). AR prior: channel-by-channel host loop mirroring
    # AutoregressiveCategoricalPriorCoder (finite-state AR with on-device
    # per-element PMFs).
    def pmf_table(self):
        pmf = jnp.exp(self._static_prior_logits())
        L, K = pmf.shape
        return (pmf, jnp.zeros((L,), jnp.float32),
                jnp.full((L,), K, jnp.int32), jnp.zeros((L,), jnp.int32))

    def ar_step_pmf(self, decoded_symbols, dim: int):
        onehot = jax.nn.one_hot(decoded_symbols, self.num_embeddings,
                                dtype=jnp.float32)
        feats = jnp.einsum("...lk,lkd->...ld", onehot, self.codebook)
        logits = self._ar_prior_logits(feats)
        return jax.nn.softmax(logits[..., dim, :], -1)

    def host_encode(self, codec, node, value, prior, pair):
        if not self.use_autoregressive_prior:
            # Static index prior: the generic PerChannelPMFCoder rANS path.
            symbols = np.asarray(
                codec._node_fn(codec.params, node, "symbols", value))
            idx = np.broadcast_to(
                np.arange(symbols.shape[-1], dtype=np.int32), symbols.shape)
            stream = pair.enc.encode_with_indexes(symbols, idx)
            decoded = codec._node_fn(codec.params, node, "dequantize",
                                     jnp.asarray(symbols))
            return stream, decoded
        from .categorical import AutoregressiveCategoricalPriorCoder as _A
        return _A.host_encode(self, codec, node, value, prior, pair)

    def host_decode(self, codec, node, stream, prior, shape, pair):
        if not self.use_autoregressive_prior:
            idx = np.broadcast_to(
                np.arange(shape[-1], dtype=np.int32), shape)
            symbols = pair.dec.decode_with_indexes(stream, idx)
            return codec._node_fn(codec.params, node, "dequantize",
                                  jnp.asarray(symbols))
        from .categorical import AutoregressiveCategoricalPriorCoder as _A
        return _A.host_decode(self, codec, node, stream, prior, shape, pair)

    @property
    def latent_dims(self):  # AR host-loop protocol (categorical.py)
        return self.num_groups
