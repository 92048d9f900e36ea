"""VQ-VAE model family (parity: reference cbench/nn/models/vqvae.py /
vqvae_model_v2.py — VQ-VAE encoder/decoder stacks with EMA codebooks, used
by the VQ prior coders in the reference's prior-coder zoo).

TPU-first: codebook lookup is one (N*H*W, D) x (D, K) matmul on the MXU;
EMA updates are pure functional (new codebook returned as aux state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import ResidualBlock


class VectorQuantizerEMA(nn.Module):
    """EMA vector quantizer (van den Oord et al.).

    Training returns straight-through quantized values + commitment loss;
    the EMA statistics live in a 'vq_stats' mutable collection.
    """

    num_codes: int = 512
    dim: int = 64
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5

    def setup(self):
        self.codebook = self.variable(
            "vq_stats", "codebook",
            lambda: jax.random.normal(jax.random.PRNGKey(0),
                                      (self.num_codes, self.dim)) * 0.1)
        self.ema_count = self.variable("vq_stats", "ema_count",
                                       lambda: jnp.zeros((self.num_codes,)))
        self.ema_sum = self.variable("vq_stats", "ema_sum",
                                     lambda: jnp.array(self.codebook.value))

    def __call__(self, z, training: bool = True):
        codebook, ema_count, ema_sum = self.codebook, self.ema_count, self.ema_sum
        flat = z.reshape(-1, self.dim)
        # Distances via the MXU: |z|^2 - 2 z.C^T + |C|^2.
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ codebook.value.T
             + jnp.sum(codebook.value ** 2, 1)[None, :])
        indices = jnp.argmin(d, axis=1)
        quantized = codebook.value[indices].reshape(z.shape)

        commitment = jnp.mean((jax.lax.stop_gradient(quantized) - z) ** 2)
        quantized_st = z + jax.lax.stop_gradient(quantized - z)

        if training and not self.is_initializing():
            onehot = jax.nn.one_hot(indices, self.num_codes)
            count = onehot.sum(0)
            code_sum = onehot.T @ flat
            new_count = self.decay * ema_count.value + (1 - self.decay) * count
            new_sum = self.decay * ema_sum.value + (1 - self.decay) * code_sum
            n = new_count.sum()
            stable = (new_count + self.eps) / (n + self.num_codes * self.eps) * n
            codebook.value = new_sum / stable[:, None]
            ema_count.value = new_count
            ema_sum.value = new_sum

        return quantized_st, indices.reshape(z.shape[:-1]), self.beta * commitment

    def lookup(self, indices):
        return self.codebook.value[indices]


class VQVAE(nn.Module):
    """Conv VQ-VAE: 4x-downsampling encoder, pluggable VQ bottleneck,
    decoder.

    quantizer selects the bottleneck family (the reference's vqvae /
    vqvae_selftrain_gssoft / vqvae_pvq / vqvae_sp prior-model configs,
    configs/nn_imagenet32.py:18-24):
      "ema"     VectorQuantizerEMA (reference vqvae.py VQEmbeddingEMA)
      "gssoft"  Gumbel-softmax soft quantizer (VQEmbeddingGSSoft)
      "pyramid" multi-scale residual VQ (PyramidVQEmbedding)
      "multi"   channel-split multi-codebook VQ (MultiVectorQuantizerWrapper)
    """

    hidden: int = 128
    dim: int = 64
    num_codes: int = 512
    quantizer: str = "ema"
    # (key, value) pairs forwarded to the quantizer module — the gssoft
    # variant grid's dist_type/use_st_gumbel/test_sampling/kl_cost/
    # commitment knobs (reference configs/nn.py active experiments).
    quantizer_opts: tuple = ()

    def setup(self):
        # k=4 s=2 with pad 1 (standard VQ-VAE geometry: H -> H/2).
        self.encoder = nn.Sequential([
            nn.Conv(self.hidden, (4, 4), (2, 2), padding=((1, 1), (1, 1))),
            nn.relu,
            nn.Conv(self.hidden, (4, 4), (2, 2), padding=((1, 1), (1, 1))),
            nn.relu,
            ResidualBlock(self.hidden), ResidualBlock(self.hidden),
            nn.Conv(self.dim, (1, 1)),
        ])
        if self.quantizer == "ema":
            self.vq = VectorQuantizerEMA(self.num_codes, self.dim)
        elif self.quantizer == "gssoft":
            self.vq = VQEmbeddingGSSoft(self.num_codes, self.dim,
                                        **dict(self.quantizer_opts))
        elif self.quantizer == "pyramid":
            self.vq = PyramidVQEmbedding(self.num_codes, self.dim)
        elif self.quantizer == "multi":
            self.vq = MultiVectorQuantizerWrapper(
                num_quantizers=2, num_codes=self.num_codes,
                dim=self.dim // 2)
        else:
            raise ValueError(f"unknown quantizer {self.quantizer!r}")
        self.decoder = nn.Sequential([
            nn.Conv(self.hidden, (1, 1)),
            ResidualBlock(self.hidden), ResidualBlock(self.hidden),
            nn.ConvTranspose(self.hidden, (4, 4), (2, 2), padding="SAME"),
            nn.relu,
            nn.ConvTranspose(3, (4, 4), (2, 2), padding="SAME"),
        ])
        # Learned categorical prior over code indices -> bits for coding.
        self.index_logits = self.param(
            "index_logits", lambda k: jnp.zeros((self.num_codes,)))

    def _quantize(self, z, training, rng, **temps):
        if self.quantizer == "gssoft":
            return self.vq(z, training=training, rng=rng, **temps)
        return self.vq(z, training=training)

    def __call__(self, x, training: bool = True, rng=None,
                 gs_temp=None, relax_temp=None):
        z = self.encoder(x)
        temps = {}
        if self.quantizer == "gssoft":
            temps = {"gs_temp": gs_temp, "relax_temp": relax_temp}
        zq, indices, loss_commit = self._quantize(z, training, rng, **temps)
        x_hat = self.decoder(zq)
        if isinstance(indices, (list, tuple)):
            # multi-map quantizers: uniform-prior code cost per map
            bits = sum(float(np.log2(self.num_codes)) * idx.size
                       for idx in indices) * jnp.float32(1.0)
            lik = None
        else:
            logp = jax.nn.log_softmax(self.index_logits)[indices]
            bits = -logp.sum() / jnp.log(2.0)
            lik = jnp.exp(logp)
        mse = jnp.mean((x - x_hat) ** 2)
        out = {
            "x_hat": x_hat,
            "indices": indices,
            "losses": {"loss_commit": loss_commit,
                       "loss_distortion": 255.0 ** 2 * 0.01 * mse},
            "metrics": {"mse": mse, "code_bits": bits},
        }
        if lik is not None:
            out["likelihoods"] = {"codes": lik}
        return out

    # coding-path helpers
    def encode_indices(self, x):
        z = self.encoder(x)
        zq, indices, _ = self.vq(z, training=False)
        return indices

    def decode_indices(self, indices):
        zq = self.vq.lookup(indices)
        return jnp.clip(self.decoder(zq), 0.0, 1.0)

    def index_pmf(self):
        return jax.nn.softmax(self.index_logits)

    @nn.nowrap
    def index_map_shapes(self, padded_h: int, padded_w: int):
        """Host-side coding helper: the (h, w) of every index map
        encode_indices emits for a padded input — one per scale for the
        pyramid quantizer, one per channel split for multi, else one."""
        ih, iw = padded_h // 4, padded_w // 4
        if self.quantizer == "pyramid":
            return [(-(-ih // 2 ** s), -(-iw // 2 ** s)) for s in range(3)]
        if self.quantizer == "multi":
            return [(ih, iw)] * 2
        return [(ih, iw)]


class VQEmbeddingGSSoft(nn.Module):
    """Gumbel-softmax soft vector quantizer (reference vqvae.py:200
    VQEmbeddingGSSoft): training output is the SOFT codeword mixture under
    a distance-softmax relaxed sample, with the categorical-KL-to-uniform
    rate term; eval snaps to the argmax codeword.

    Variant knobs (reference configs/nn.py active experiment grid /
    vqvae.py VQEmbeddingGSSoft kwargs):
      dist_type            relaxation family for the training sample:
                           "gssoft"/"relaxed" (Gumbel-softmax),
                           "asymptotic" (AsymptoticRelaxedOneHotCategorical),
                           "double" (DoubleRelaxedOneHotCategorical)
      use_st_gumbel        straight-through hard one-hot in training
      test_sampling        sample the categorical at eval (vs argmax)
      kl_cost              multiplier on the KL-to-uniform rate term
                           (0.0 and -1.0 ablations in the reference grid)
      commitment_cost      ||sg(q) - z||^2 commitment added to the loss
      commitment_over_exp  commitment measured against the EXPECTED
                           codeword (softmax mixture) instead of the
                           sampled/hard one
    Temperatures gs_temp (sampling) and relax_temp (the double/asymptotic
    relaxation's second temperature) are call kwargs so anneal schedules
    can trace them per step."""

    num_codes: int = 512
    dim: int = 64
    tau: float = 1.0
    dist_type: str = "gssoft"
    use_st_gumbel: bool = False
    test_sampling: bool = False
    kl_cost: float = 1.0
    commitment_cost: float = 0.0
    commitment_over_exp: bool = False

    def setup(self):
        # setup-style (not compact) so the coding path's lookup() can
        # share the codebook param with __call__
        self.codebook = self.param("codebook", nn.initializers.normal(0.1),
                                   (self.num_codes, self.dim))

    def __call__(self, z, training: bool = True, rng=None,
                 gs_temp=None, relax_temp=None):
        from ..distributions import (
            asymptotic_relaxed_one_hot,
            double_relaxed_one_hot,
            relaxed_one_hot_categorical,
        )
        codebook = self.codebook
        flat = z.reshape(-1, self.dim)
        d = (jnp.sum(flat ** 2, 1, keepdims=True)
             - 2 * flat @ codebook.T
             + jnp.sum(codebook ** 2, 1)[None, :])
        logits = -d
        temp = self.tau if gs_temp is None else gs_temp
        rtemp = 1.0 if relax_temp is None else relax_temp
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            if self.dist_type in ("gssoft", "relaxed"):
                probs = relaxed_one_hot_categorical(rng, logits, temp)
            elif self.dist_type == "asymptotic":
                probs = asymptotic_relaxed_one_hot(rng, logits, temp, rtemp)
            elif self.dist_type == "double":
                probs = double_relaxed_one_hot(rng, logits, temp, rtemp)
            else:
                raise ValueError(f"unknown dist_type {self.dist_type!r}")
            if self.use_st_gumbel:
                hard = jax.nn.one_hot(jnp.argmax(probs, -1), self.num_codes,
                                      dtype=probs.dtype)
                probs = probs + jax.lax.stop_gradient(hard - probs)
        elif self.test_sampling:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            probs = jax.nn.one_hot(
                jax.random.categorical(rng, logits, -1), self.num_codes)
        else:
            probs = jax.nn.one_hot(jnp.argmax(logits, -1), self.num_codes)
        quantized = (probs @ codebook).reshape(z.shape)
        logp = jax.nn.log_softmax(logits, -1)
        kl = jnp.mean(jnp.sum(jnp.exp(logp) * (logp + jnp.log(self.num_codes)),
                              -1))
        loss = self.kl_cost * kl
        if self.commitment_cost:
            target = (jax.nn.softmax(logits, -1) @ codebook).reshape(z.shape) \
                if self.commitment_over_exp else quantized
            loss = loss + self.commitment_cost * jnp.mean(
                (jax.lax.stop_gradient(target) - z) ** 2)
        indices = jnp.argmax(logits, -1).reshape(z.shape[:-1])
        return quantized, indices, loss

    def lookup(self, indices):
        return self.codebook[indices]


class PyramidVQEmbedding(nn.Module):
    """Multi-scale VQ (reference vqvae.py:328 PyramidVQEmbedding): the
    latent is quantized at L dyadic scales with per-scale codebooks; each
    scale quantizes the residual of the upsampled coarser reconstruction."""

    num_codes: int = 256
    dim: int = 64
    num_scales: int = 3
    beta: float = 0.25

    def setup(self):
        # one codebook per scale; setup-style so lookup() can decode the
        # pyramid from index maps alone (coding path)
        self.codebooks = [
            self.param(f"codebook_{s}", nn.initializers.normal(0.1),
                       (self.num_codes, self.dim))
            for s in range(self.num_scales)]

    def __call__(self, z, training: bool = True):
        n, h, w, c = z.shape
        recon = jnp.zeros_like(z)
        losses = 0.0
        index_maps = []
        for s in reversed(range(self.num_scales)):  # coarse -> fine
            f = 2 ** s
            codebook = self.codebooks[s]
            target = (z - recon)[:, ::f, ::f, :]
            flat = target.reshape(-1, self.dim)
            d = (jnp.sum(flat ** 2, 1, keepdims=True)
                 - 2 * flat @ codebook.T
                 + jnp.sum(codebook ** 2, 1)[None, :])
            idx = jnp.argmin(d, axis=1)
            q = codebook[idx].reshape(target.shape)
            losses = losses + self.beta * jnp.mean(
                (jax.lax.stop_gradient(q) - target) ** 2) + jnp.mean(
                (q - jax.lax.stop_gradient(target)) ** 2)
            q_st = target + jax.lax.stop_gradient(q - target)
            up = jnp.repeat(jnp.repeat(q_st, f, axis=1), f, axis=2)
            recon = recon + up[:, :h, :w, :]
            index_maps.append(idx.reshape(target.shape[:-1]))
        return recon, index_maps[::-1], losses

    def lookup(self, index_maps):
        """Reconstruct the quantized latent from the per-scale index maps
        (fine -> coarse order, as returned by __call__)."""
        fine = index_maps[0]
        n, h, w = fine.shape
        recon = jnp.zeros((n, h, w, self.dim))
        for s in reversed(range(self.num_scales)):
            f = 2 ** s
            q = self.codebooks[s][index_maps[s]]
            up = jnp.repeat(jnp.repeat(q, f, axis=1), f, axis=2)
            recon = recon + up[:, :h, :w, :]
        return recon


class MultiVectorQuantizerWrapper(nn.Module):
    """Channel-split multi-VQ (reference vqvae.py:494): the feature splits
    into per-quantizer channel slices, each with its own codebook."""

    num_quantizers: int = 2
    num_codes: int = 256
    dim: int = 32  # per-quantizer channel width
    beta: float = 0.25

    def setup(self):
        self.quantizers = [
            VectorQuantizerEMA(num_codes=self.num_codes, dim=self.dim,
                               beta=self.beta)
            for _ in range(self.num_quantizers)]

    def __call__(self, z, training: bool = True):
        parts = jnp.split(z, self.num_quantizers, axis=-1)
        outs, idxs, loss = [], [], 0.0
        for q, part in zip(self.quantizers, parts):
            o, i, l = q(part, training=training)
            outs.append(o)
            idxs.append(i)
            loss = loss + l
        return jnp.concatenate(outs, -1), idxs, loss

    def lookup(self, index_list):
        return jnp.concatenate(
            [q.lookup(i) for q, i in zip(self.quantizers, index_list)], -1)


class VQVAEEncoder(nn.Module):
    """Standalone VQ-VAE encoder stack (the VQVAE.setup encoder as a
    reusable layer — parity: reference configs/nnmodules/layers/
    vqvae_encoder.py over the vqvae model's encoder)."""

    hidden: int = 128
    dim: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.hidden, (4, 4), (2, 2),
                            padding=((1, 1), (1, 1)))(x))
        h = nn.relu(nn.Conv(self.hidden, (4, 4), (2, 2),
                            padding=((1, 1), (1, 1)))(h))
        h = ResidualBlock(self.hidden)(h)
        h = ResidualBlock(self.hidden)(h)
        return nn.Conv(self.dim, (1, 1))(h)


class VQVAEDecoder(nn.Module):
    """Standalone VQ-VAE decoder stack (parity: reference
    configs/nnmodules/layers/vqvae_decoder.py)."""

    hidden: int = 128
    out_channels: int = 3

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(self.hidden, (1, 1))(z)
        h = ResidualBlock(self.hidden)(h)
        h = ResidualBlock(self.hidden)(h)
        h = nn.relu(nn.ConvTranspose(self.hidden, (4, 4), (2, 2),
                                     padding="SAME")(h))
        return nn.ConvTranspose(self.out_channels, (4, 4), (2, 2),
                                padding="SAME")(h)
