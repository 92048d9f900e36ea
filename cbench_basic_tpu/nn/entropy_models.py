"""Entropy models: factorized EntropyBottleneck and GaussianConditional.

Behavioral parity with the CompressAI entropy models the reference builds on
(contract documented at reference
cbench/modules/prior_model/prior_coder/compressai_coder.py:87-250 and
compressai_coder.py:341-555): learned-cumulative factorized prior with
quantile aux loss and exportable quantized-CDF tables; Gaussian conditional
with log-spaced scale table and erfc-based standardized cumulative.

TPU-first: everything here is pure jnp and jittable; quantized-CDF tables
are computed on-device as PMFs and only the final integer CDF quantization
(frequency stealing, inherently sequential) runs on the host C++ backend.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import lower_bound

LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def quantize_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through rounding."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def add_uniform_noise(x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    return x + jax.random.uniform(rng, x.shape, minval=-0.5, maxval=0.5)


class EntropyBottleneck(nn.Module):
    """Univariate factorized prior with a learned cumulative per channel."""

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = TAIL_MASS

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        c = self.channels
        matrices, biases, factors = [], [], []
        for k in range(len(self.filters) + 1):
            init = float(np.log(np.expm1(1 / scale / dims[k + 1])))
            matrices.append(self.param(
                f"matrix_{k}", lambda key, sh, v=init: jnp.full(sh, v),
                (c, dims[k + 1], dims[k])))
            biases.append(self.param(
                f"bias_{k}",
                lambda key, sh: jax.random.uniform(key, sh, minval=-0.5, maxval=0.5),
                (c, dims[k + 1], 1)))
            if k < len(self.filters):
                factors.append(self.param(
                    f"factor_{k}", lambda key, sh: jnp.zeros(sh),
                    (c, dims[k + 1], 1)))
        self._matrices, self._biases, self._factors = matrices, biases, factors

        self.quantiles = self.param(
            "quantiles",
            lambda key: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale]).reshape(1, 1, 3),
                (c, 1, 1)))

    def _logits_cumulative(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (C, 1, N) -> logits of the learned CDF, same shape."""
        for k in range(len(self.filters) + 1):
            x = jnp.matmul(jax.nn.softplus(self._matrices[k]), x,
                           preferred_element_type=jnp.float32)
            x = x + self._biases[k]
            if k < len(self._factors):
                x = x + jnp.tanh(self._factors[k]) * jnp.tanh(x)
        return x

    def _likelihood(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (C, 1, N). sign trick for numerical symmetry (CompressAI)."""
        lower = self._logits_cumulative(x - 0.5)
        upper = self._logits_cumulative(x + 0.5)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def medians(self) -> jnp.ndarray:
        return self.quantiles[:, 0, 1]

    def __call__(self, x: jnp.ndarray, training: bool = True,
                 rng: Optional[jax.Array] = None):
        """x: NHWC. Returns (x_hat, likelihood) in NHWC."""
        n, h, w, c = x.shape
        perm = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, 1, -1)
        medians = jax.lax.stop_gradient(self.medians()).reshape(c, 1, 1)
        if training:
            if rng is None:
                raise ValueError("training forward needs an rng")
            x_q = add_uniform_noise(perm, rng)
        else:
            x_q = jnp.round(perm - medians) + medians
        lik = lower_bound(self._likelihood(x_q), LIKELIHOOD_BOUND)
        x_hat = x_q.reshape(c, n, h, w).transpose(1, 2, 3, 0)
        lik = lik.reshape(c, n, h, w).transpose(1, 2, 3, 0)
        return x_hat, lik

    def aux_loss(self) -> jnp.ndarray:
        """Drives quantiles to the (tail, median, 1-tail) targets."""
        logits = self._logits_cumulative(self.quantiles)
        t = float(np.log(self.tail_mass / 2 / (1 - self.tail_mass / 2)))
        target = jnp.array([t, 0.0, -t]).reshape(1, 1, 3)
        return jnp.sum(jnp.abs(logits - target))

    # -- coding-table export (jittable PMF part) -----------------------------
    def pmf_table(self):
        """Returns (pmf, tail_mass, pmf_length, offset) for CDF export.

        pmf: (C, max_len) float32; pmf_length/offset: (C,) int32.
        Host code appends tail mass and runs quantize_pmf per channel.
        """
        medians = self.medians()
        minima = jnp.maximum(
            jnp.ceil(medians - self.quantiles[:, 0, 0]).astype(jnp.int32), 0)
        maxima = jnp.maximum(
            jnp.ceil(self.quantiles[:, 0, 2] - medians).astype(jnp.int32), 0)
        pmf_length = minima + maxima + 1
        max_length = int(jnp.max(pmf_length))
        samples = jnp.arange(max_length, dtype=jnp.float32)[None, None, :]
        samples = samples + (medians - minima.astype(jnp.float32)).reshape(-1, 1, 1)
        pmf = self._likelihood(samples)[:, 0, :]
        lower = jax.nn.sigmoid(self._logits_cumulative(
            samples[:, :, :1] - 0.5))[:, 0, 0]
        upper = jax.nn.sigmoid(self._logits_cumulative(
            samples[:, :, -1:] + 0.5))[:, 0, 0]
        tail = lower + (1.0 - upper)
        return pmf, tail, pmf_length, -minima


def default_scale_table(min_scale: float = 0.11, max_scale: float = 256.0,
                        levels: int = 64) -> np.ndarray:
    return np.exp(np.linspace(np.log(min_scale), np.log(max_scale), levels))


def _standardized_cumulative(x: jnp.ndarray) -> jnp.ndarray:
    """Φ(x) via erfc for upper-tail accuracy."""
    return 0.5 * jax.lax.erfc(-(2 ** -0.5) * x)


class GaussianConditional:
    """Conditional Gaussian entropy model over a fixed scale table.

    Stateless (no learned params): likelihood during training and
    index/table building for coding. Matches CompressAI semantics.
    """

    def __init__(self, scale_table=None, scale_bound: float = 0.11,
                 tail_mass: float = TAIL_MASS):
        self.scale_table = np.asarray(
            scale_table if scale_table is not None else default_scale_table())
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)

    def likelihood(self, x: jnp.ndarray, scales: jnp.ndarray,
                   means: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        scales = lower_bound(scales, self.scale_bound)
        values = x - means if means is not None else x
        values = jnp.abs(values)
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        return lower_bound(upper - lower, LIKELIHOOD_BOUND)

    def __call__(self, x: jnp.ndarray, scales: jnp.ndarray,
                 means: Optional[jnp.ndarray] = None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        if training:
            if rng is None:
                raise ValueError("training forward needs an rng")
            x_q = add_uniform_noise(x, rng)
        else:
            if means is not None:
                x_q = jnp.round(x - means) + means
            else:
                x_q = jnp.round(x)
        return x_q, self.likelihood(x_q, scales, means)

    def build_indexes(self, scales: jnp.ndarray) -> jnp.ndarray:
        """Per-element scale-table index (lower-bound select)."""
        scales = lower_bound(scales, self.scale_bound)
        table = jnp.asarray(self.scale_table[:-1], dtype=scales.dtype)
        return jnp.sum(scales[..., None] > table, axis=-1).astype(jnp.int32)

    def pmf_table(self):
        """(pmf, tail_mass, pmf_length, offset) rows per scale-table entry."""
        mult = float(-np.array(
            _standardized_cumulative_inv(self.tail_mass / 2)))
        table = jnp.asarray(self.scale_table, jnp.float32)
        pmf_center = jnp.ceil(table * mult).astype(jnp.int32)
        pmf_length = 2 * pmf_center + 1
        max_length = int(jnp.max(pmf_length))
        samples = jnp.abs(jnp.arange(max_length, dtype=jnp.float32)[None, :]
                          - pmf_center[:, None].astype(jnp.float32))
        s = table[:, None]
        upper = _standardized_cumulative((0.5 - samples) / s)
        lower = _standardized_cumulative((-0.5 - samples) / s)
        pmf = upper - lower
        tail = 2.0 * lower[:, 0]
        return pmf, tail, pmf_length, -pmf_center


def _standardized_cumulative_inv(q: float) -> float:
    """Standard normal PPF (host-side scalar; scipy-free Acklam rational
    approximation refined by one Halley step)."""
    # Acklam's algorithm constants.
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if q < plow:
        ql = np.sqrt(-2 * np.log(q))
        x = (((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]) / \
            ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
    elif q <= phigh:
        ql = q - 0.5
        r = ql * ql
        x = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * ql / \
            (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
    else:
        ql = np.sqrt(-2 * np.log(1 - q))
        x = -(((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4]) * ql + c[5]) / \
            ((((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1)
    # One Halley refinement using erfc.
    from math import erfc, exp, pi, sqrt
    e = 0.5 * erfc(-x / sqrt(2)) - q
    u = e * sqrt(2 * pi) * exp(x * x / 2)
    x = x - u / (1 + x * u / 2)
    return x


def export_cdf_tables(pmf: np.ndarray, tail: np.ndarray, pmf_length: np.ndarray,
                      offset: np.ndarray, precision: int = 16,
                      margin: int = 0):
    """Turn per-row PMFs into dense quantized-CDF arrays for the rANS coder.

    Returns (cdfs [R, max_len+2], cdf_sizes [R], offsets [R]) int32, matching
    the layout expected by Rans64{Encoder,Decoder}.init_cdf_params.

    margin > 0 widens every row by ±margin minimum-frequency slots (the
    bypass-free interleaved TPU mode uses this instead of escape coding —
    each extra slot costs one 2^-precision count).
    """
    from ..coding.rans import pmf_to_quantized_cdf

    pmf = np.asarray(pmf, np.float64)
    tail = np.asarray(tail, np.float64)
    pmf_length = np.asarray(pmf_length, np.int32)
    offset = np.asarray(offset, np.int32)
    rows = pmf.shape[0]
    max_len = int(pmf_length.max()) + 2 + 2 * margin
    cdfs = np.zeros((rows, max_len), np.int32)
    sizes = np.zeros(rows, np.int32)
    eps = np.full(margin, 1e-9)
    for r in range(rows):
        n = int(pmf_length[r])
        row = np.concatenate(
            [eps, pmf[r, :n], eps, [max(tail[r], 1e-12)]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(row, precision)
        cdfs[r, :len(cdf)] = cdf
        sizes[r] = len(cdf)
    return cdfs, sizes, offset - margin
