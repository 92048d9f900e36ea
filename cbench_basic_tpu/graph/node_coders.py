"""Latent-graph node entropy coders (flax modules).

Parity targets in the reference:
  * LossyDummyEntropyCoder (latent_graph.py:68-144): node-x "coder" whose
    rate is zero and whose loss is the λ-weighted distortion to the prior;
    decode returns the prior.
  * CompressAIEntropyBottleneckPriorCoder (compressai_coder.py:87-250):
    factorized z coder.
  * GaussianDistributionEntropyCoder / GaussianConditional prior coders
    (compressai_coder.py:341+, dist_entropy.py): y coder with prior-derived
    (scale, mean).

Each node coder is a flax module with a uniform protocol:
    __call__(value, prior=None, training=True, rng=None) -> dict with
        "value_hat", "likelihood" (None for zero-rate nodes), "loss" extras
plus coding-path helper methods used by the codec wrapper.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.entropy_models import EntropyBottleneck, GaussianConditional


class LossyDummyCoder(nn.Module):
    """Distortion-as-entropy-coder for the data node x.

    distortion="mse": loss = λ·255²·MSE (reference MSE objective).
    distortion="ms_ssim": loss = λ·(1 − MS-SSIM) — the ft-ssim fine-tune
    objective (preset `...-grouped-ft-ssim`); falls back to single-scale
    SSIM when the patch is too small for 5 dyadic scales.
    distortion="ce": lossless-reconstruction cross-entropy — x is modeled
    by a discretized logistic centered at x_hat with a learned per-channel
    scale; loss = λ · bits(x | x_hat) (the reference lossless-autoencoder
    distortion_type="ce", prior_model/autoencoder_v2.py
    LosslessAutoEncoderPriorModelBackboneV2).
    """

    lmbda: float = 0.01
    distortion: str = "mse"

    @nn.compact
    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, lmbda=None):
        if prior is None:
            raise ValueError("LossyDummyCoder needs the generative prior (x_hat)")
        # lmbda override may be a TRACED scalar (per-replica rate weight in
        # model-list-parallel training or a scheduled value); defaults to the
        # static module attribute.
        lam = self.lmbda if lmbda is None else lmbda
        x_hat = prior
        mse = jnp.mean((value - x_hat) ** 2)
        metrics = {"mse": mse}
        if self.distortion == "ms_ssim":
            from ..ops.image_metrics import ms_ssim, ssim
            small = min(value.shape[1], value.shape[2]) < 176
            quality = (ssim(value, x_hat) if small else ms_ssim(value, x_hat))
            # 255^2 matches the reference's num_elem scaling of
            # (1 - ms_ssim) relative to its sum-MSE term
            # (latent_graph.py:93-96): the SAME lambda list serves both
            # stages, as in the ft-ssim presets.
            loss_distortion = lam * (255.0 ** 2) * (1.0 - quality)
            metrics["ms_ssim"] = quality
        elif self.distortion == "ce":
            from ..nn.distributions import discretized_logistic_likelihood
            log_scale = self.param(
                "ce_log_scale", nn.initializers.constant(-4.0),
                (value.shape[-1],))
            lik = discretized_logistic_likelihood(
                value * 255.0, x_hat * 255.0,
                jnp.exp(log_scale) * 255.0, bin_size=1.0)
            ce_bits = -jnp.mean(jnp.log2(jnp.clip(lik, 1e-9)))
            loss_distortion = lam * ce_bits
            metrics["ce_bits_per_dim"] = ce_bits
        else:
            loss_distortion = lam * (255.0 ** 2) * mse
        return {
            "value_hat": x_hat,
            "likelihood": None,
            "loss_distortion": loss_distortion,
            "metrics": metrics,
        }


class NNPerceptualLossyCoder(nn.Module):
    """Perceptual distortion x-node coder — parity target:
    NNBasedLossyDummyEntropyCoder (reference latent_graph.py:147), whose
    loss is a feature-space (VGG/LPIPS-style) distance.

    This environment has no pretrained VGG (zero egress), so the feature
    extractor is a FIXED random conv pyramid — random multi-scale conv
    features are a documented LPIPS surrogate (Zhang et al. 2018 report
    random-init nets already correlate with human judgments). Weights are
    deterministic constants derived from `feature_seed` (not trainable
    params) so the metric is stable across training and checkpoints.
    loss = λ·(255²·MSE + perceptual_weight · feature MSE over the pyramid).
    """

    lmbda: float = 0.01
    perceptual_weight: float = 1000.0
    feature_channels: int = 24
    num_scales: int = 3
    feature_seed: int = 17

    def _feature_kernels(self):
        ks = []
        key = jax.random.PRNGKey(self.feature_seed)
        cin = 3
        for _ in range(self.num_scales):
            key, sub = jax.random.split(key)
            fan_in = 3 * 3 * cin
            ks.append(jax.random.normal(
                sub, (3, 3, cin, self.feature_channels))
                * (2.0 / fan_in) ** 0.5)
            cin = self.feature_channels
        return ks

    def features(self, x):
        """L2-normalized multi-scale random conv features (list per scale)."""
        feats = []
        h = x
        for k in self._feature_kernels():
            dn = jax.lax.conv_dimension_numbers(
                h.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            h = jax.lax.conv_general_dilated(
                h, k, (2, 2), "SAME", dimension_numbers=dn)
            h = jax.nn.leaky_relu(h)
            norm = jnp.sqrt(jnp.sum(h ** 2, -1, keepdims=True) + 1e-10)
            feats.append(h / norm)
        return feats

    @nn.compact
    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, lmbda=None):
        if prior is None:
            raise ValueError("NNPerceptualLossyCoder needs the generative prior")
        lam = self.lmbda if lmbda is None else lmbda
        x_hat = prior
        mse = jnp.mean((value - x_hat) ** 2)
        fa = self.features(value)
        fb = self.features(x_hat)
        perceptual = sum(jnp.mean((a - b) ** 2) for a, b in zip(fa, fb))
        return {
            "value_hat": x_hat,
            "likelihood": None,
            "loss_distortion": lam * ((255.0 ** 2) * mse
                                      + self.perceptual_weight * perceptual),
            "metrics": {"mse": mse, "perceptual": perceptual},
        }


class CombinedLossyCoder(nn.Module):
    """Blend of lossy x-node coders — parity: CombinedLossyDummyEntropyCoder
    (reference latent_graph.py:225-251): runs every sub-coder on the same
    (value, prior) and sums their distortion losses with `blend_weight`
    (traced override supported, e.g. from a dynamic blend node).

    distortions: tuple of LossyDummyCoder distortion names ("mse"/"ms_ssim")
    and/or "perceptual" (NNPerceptualLossyCoder).
    """

    lmbda: float = 0.01
    distortions: tuple = ("mse", "ms_ssim")
    blend_weights: tuple = None

    def setup(self):
        coders = []
        for d in self.distortions:
            if d == "perceptual":
                coders.append(NNPerceptualLossyCoder(lmbda=1.0))
            else:
                coders.append(LossyDummyCoder(lmbda=1.0, distortion=d))
        self.coders = coders

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, lmbda=None,
                 blend_weight=None):
        if prior is None:
            raise ValueError("CombinedLossyCoder needs the generative prior")
        lam = self.lmbda if lmbda is None else lmbda
        weights = blend_weight if blend_weight is not None else (
            self.blend_weights or (1.0,) * len(self.coders))
        total = 0.0
        metrics = {}
        for i, coder in enumerate(self.coders):
            out = coder(value, prior=prior, training=training, rng=rng)
            total = total + weights[i] * out["loss_distortion"]
            for k, v in out["metrics"].items():
                metrics.setdefault(k, v)
        return {
            "value_hat": prior,
            "likelihood": None,
            "loss_distortion": lam * total,
            "metrics": metrics,
        }


class StraightForwardDummyCoder(nn.Module):
    """Zero-rate, zero-loss passthrough node coder — parity:
    StraightForwardDummyEntropyCoder (reference latent_graph.py:254-267):
    forward/decode return the prior, encode emits no bytes."""

    @nn.compact
    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, **_):
        return {
            "value_hat": prior if prior is not None else value,
            "likelihood": None,
            "loss_distortion": jnp.zeros(()),
            "metrics": {},
        }


class PerChannelPMFCoder(nn.Module):
    """Marker/protocol for coders whose coding path is: per-channel static
    PMF tables (`pmf_table()` -> (pmf, tail, lengths, offsets) rows, one per
    symbol plane), prior-free `symbols(value)` quantization and
    `dequantize(symbols)` reconstruction. The codec routes any such coder
    through the FactorizedCoder-style rANS path (graph_codec._encode_node)."""

    def pmf_table(self):
        raise NotImplementedError

    def symbols(self, value):
        raise NotImplementedError

    def dequantize(self, symbols):
        raise NotImplementedError


class FactorizedCoder(PerChannelPMFCoder):
    """Factorized (hyper)prior coder over an EntropyBottleneck."""

    channels: int

    def setup(self):
        self.eb = EntropyBottleneck(self.channels)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        v_hat, lik = self.eb(value, training=training, rng=rng)
        return {"value_hat": v_hat, "likelihood": lik}

    # coding-path helpers
    def medians(self):
        return self.eb.medians()

    def pmf_table(self):
        return self.eb.pmf_table()

    def aux_loss(self):
        return self.eb.aux_loss()

    def symbols(self, value):
        med = self.eb.medians().reshape(1, 1, 1, -1)
        return jnp.round(value - med).astype(jnp.int32)

    def dequantize(self, symbols):
        med = self.eb.medians().reshape(1, 1, 1, -1)
        return symbols.astype(jnp.float32) + med


class SlimmableFactorizedCoder(FactorizedCoder):
    """Factorized coder whose ACTIVE channel count follows the complexity
    level.

    Parity: the SlimCAE-style slimmable entropy bottleneck
    (`compressai_coder_slimmable` with entropy_bottleneck_channels_list=
    [48, 72, 96, 144, 192], reference configs/lossy_graph_scalable_exp_hp.py
    :633-637). One full-width EntropyBottleneck; at level l only the first
    channels_list[l] channels carry information — the rest decode to zero
    and contribute likelihood 1 (zero rate). `sclevel` may be a static int
    or a traced scalar (jnp.where masking keeps the program level-agnostic).
    """

    channels_list: tuple = ()

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, sclevel=None):
        out = super().__call__(value, prior=prior, training=training, rng=rng)
        if sclevel is None or not self.channels_list:
            return out
        widths = jnp.asarray(self.channels_list, jnp.int32)
        idx = jnp.clip(jnp.asarray(sclevel), 0, len(self.channels_list) - 1)
        n = widths[idx.astype(jnp.int32)]
        mask = jnp.arange(self.channels) < n
        return {
            "value_hat": jnp.where(mask, out["value_hat"], 0.0),
            "likelihood": jnp.where(mask, out["likelihood"], 1.0),
        }


class GaussianCoder(nn.Module):
    """Conditional Gaussian coder; the prior tensor carries (scales[, means]).

    If `prior_channels != 2*channels` the prior is mapped through a small
    1x1-conv merger to (scales, means) — the "param merger" role
    (pgm_coder.py param mergers / hyper-synthesis heads).
    """

    channels: int
    mean_scale: bool = True
    use_merger: bool = False

    def setup(self):
        self.gaussian = GaussianConditional()
        if self.use_merger:
            self.merger = nn.Sequential([
                nn.Conv(self.channels * 2, (1, 1)), nn.leaky_relu,
                nn.Conv(self.channels * 2, (1, 1)),
            ])

    def _params_from_prior(self, prior):
        if self.use_merger:
            prior = self.merger(prior)
        if self.mean_scale:
            scales, means = jnp.split(prior, 2, axis=-1)
        else:
            scales, means = prior, None
        return scales, means

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        scales, means = self._params_from_prior(prior)
        v_hat, lik = self.gaussian(value, scales, means, training=training, rng=rng)
        return {"value_hat": v_hat, "likelihood": lik}

    # coding-path helpers
    def pmf_table(self):
        return self.gaussian.pmf_table()

    def coding_params(self, prior):
        """prior -> (indexes, means) for the rANS coder."""
        scales, means = self._params_from_prior(prior)
        return self.gaussian.build_indexes(scales), means

    def symbols(self, value, prior):
        _, means = self._params_from_prior(prior)
        v = value - means if means is not None else value
        return jnp.round(v).astype(jnp.int32)

    def dequantize(self, symbols, prior):
        _, means = self._params_from_prior(prior)
        v = symbols.astype(jnp.float32)
        return v + means if means is not None else v
