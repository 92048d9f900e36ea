"""Distribution toolbox for entropy models.

Parity targets: reference cbench/nn/distributions/* (Logistic, relaxed /
asymptotic categoricals, (Reparametrized)MixtureSameFamily) at the level
this framework consumes them — discretized likelihoods for rate estimation
and coding-table export, plus relaxed-categorical sampling for discrete
PGM training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layers import lower_bound

LIKELIHOOD_BOUND = 1e-9


# -- discretized scalar distributions -----------------------------------------
def logistic_cdf(x: jnp.ndarray, loc: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid((x - loc) / scale)


def discretized_logistic_likelihood(x, loc, scale, bin_size: float = 1.0):
    """P(x-b/2 < X <= x+b/2) under Logistic(loc, scale)."""
    scale = lower_bound(scale, 1e-6)
    upper = logistic_cdf(x + bin_size / 2, loc, scale)
    lower_ = logistic_cdf(x - bin_size / 2, loc, scale)
    return lower_bound(upper - lower_, LIKELIHOOD_BOUND)


def gaussian_cdf(x, loc, scale):
    return 0.5 * jax.lax.erfc(-(x - loc) / (scale * np.sqrt(2.0)))


def discretized_gaussian_likelihood(x, loc, scale, bin_size: float = 1.0):
    scale = lower_bound(scale, 1e-6)
    upper = gaussian_cdf(x + bin_size / 2, loc, scale)
    lower_ = gaussian_cdf(x - bin_size / 2, loc, scale)
    return lower_bound(upper - lower_, LIKELIHOOD_BOUND)


def discretized_mixture_likelihood(x, weights, locs, scales, kind: str = "logistic"):
    """Discretized mixture likelihood (MixtureSameFamily analog).

    weights/locs/scales: (..., K) mixture params broadcast against x (...).
    """
    f = (discretized_logistic_likelihood if kind == "logistic"
         else discretized_gaussian_likelihood)
    w = jax.nn.softmax(weights, axis=-1)
    lik = f(x[..., None], locs, scales)
    return lower_bound(jnp.sum(w * lik, axis=-1), LIKELIHOOD_BOUND)


# -- relaxed categoricals -------------------------------------------------------
def sample_gumbel(rng, shape, eps: float = 1e-20):
    u = jax.random.uniform(rng, shape, minval=eps, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def relaxed_one_hot_categorical(rng, logits, temperature: float = 1.0):
    """Gumbel-softmax sample (Concrete distribution)."""
    g = sample_gumbel(rng, logits.shape)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def straight_through_one_hot(rng, logits, temperature: float = 1.0):
    """ST-Gumbel: hard one-hot forward, soft gradient."""
    soft = relaxed_one_hot_categorical(rng, logits, temperature)
    hard = jax.nn.one_hot(jnp.argmax(soft, -1), logits.shape[-1], dtype=soft.dtype)
    return hard + soft - jax.lax.stop_gradient(soft)


def asymptotic_relaxed_one_hot(rng, logits, temperature: float = 1.0,
                               temperature_gumbel: float = 0.5):
    """AsymptoticRelaxedOneHotCategorical sample (reference
    nn/distributions/relaxed.py:16-70): the Gumbel noise and the logits are
    blended with weight temperature_gumbel BEFORE the Concrete softmax —
    at temperature_gumbel→0 the sample becomes the deterministic softmax,
    at 1 the standard Concrete; annealing it trades exploration for bias."""
    tg = temperature_gumbel
    g = sample_gumbel(rng, logits.shape)
    scores = (logits * (1.0 - tg) + g * tg) / temperature
    return jax.nn.softmax(scores, axis=-1)


def double_relaxed_one_hot(rng, logits, temperature: float = 1.0,
                           temperature_gumbel: float = 1.0):
    """DoubleRelaxedOneHotCategorical sample (relaxed.py:73-147): Gumbel
    noise tempered separately (g·tg) from the overall Concrete temperature."""
    g = sample_gumbel(rng, logits.shape) * temperature_gumbel
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def softmax_pp(y, tau: float = 1.0, delta: float = 1.0):
    """softmax++ transform (relaxed.py:178-216, IGR arXiv:1912.09588):
    K-1 reals -> interior of the K-simplex with an explicit remainder
    coordinate delta."""
    z = jnp.exp(y / tau)
    denom = jnp.sum(z, -1, keepdims=True) + delta
    head = z / denom
    return jnp.concatenate([head, 1.0 - jnp.sum(head, -1, keepdims=True)], -1)


def invertible_gaussian_one_hot(rng, mu, sigma, tau: float = 1.0,
                                delta: float = 1.0):
    """InvertableGaussianSoftmaxppRelaxedOneHotCategorical sample
    (relaxed.py:159-236): softmax++ of a Gaussian reparameterized draw —
    the IGR alternative to Gumbel-softmax with tractable densities."""
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return softmax_pp(mu + sigma * eps, tau, delta)


def mixture_rsample(rng, weights_logits, locs, scales, kind: str = "gaussian",
                    temperature: float = 0.5):
    """Reparameterized mixture draw (ReparametrizedMixtureSameFamily analog,
    reference nn/distributions/mixture.py:210): component chosen by an
    ST-Gumbel draw (surrogate for the implicit-reparameterization gradient),
    then an rsample inside the chosen component."""
    k_rng, s_rng = jax.random.split(rng)
    onehot = straight_through_one_hot(k_rng, weights_logits, temperature)
    loc = jnp.sum(onehot * locs, -1)
    scale = jnp.sum(onehot * scales, -1)
    if kind == "logistic":
        u = jax.random.uniform(s_rng, loc.shape, loc.dtype, 1e-6, 1.0 - 1e-6)
        return loc + scale * (jnp.log(u) - jnp.log1p(-u))
    return loc + scale * jax.random.normal(s_rng, loc.shape, loc.dtype)


def categorical_kl_to_uniform(logits):
    """KL(softmax(logits) || U) — the usual categorical prior rate term."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    k = logits.shape[-1]
    return jnp.sum(p * (logp + jnp.log(k)), axis=-1)


# -- pmf-table export for scalar families ----------------------------------------
def pmf_table_for_grid(kind: str, locs: np.ndarray, scales: np.ndarray,
                       tail_mass: float = 1e-9):
    """Per-(loc,scale) discretized PMF rows for rANS table export — the
    parametric-grid distribution coding scheme (reference dist_entropy.py:
    quantize (mean, logvar) into distribution indices, build PMF via
    truncated CDF deltas)."""
    locs = np.asarray(locs, np.float64)
    scales = np.asarray(scales, np.float64)
    if kind == "logistic":
        # Quantile of logistic: loc + s*log(p/(1-p))
        mult = float(np.log((1 - tail_mass / 2) / (tail_mass / 2)))
    else:
        from .entropy_models import _standardized_cumulative_inv
        mult = float(-_standardized_cumulative_inv(tail_mass / 2))
    half = np.ceil(np.abs(locs) + scales * mult).astype(np.int64)
    length = 2 * half + 1
    max_len = int(length.max())
    rows = len(locs)
    pmf = np.zeros((rows, max_len))
    tail = np.zeros(rows)
    for r in range(rows):
        xs = np.arange(length[r]) - half[r]
        if kind == "logistic":
            cdf = 1.0 / (1.0 + np.exp(-(xs[None] + np.array([[0.5], [-0.5]])
                                        - locs[r]) / scales[r]))
        else:
            from math import erf
            z = (xs[None] + np.array([[0.5], [-0.5]]) - locs[r]) / \
                (scales[r] * np.sqrt(2.0))
            cdf = 0.5 * (1 + np.vectorize(erf)(z))
        pmf[r, :length[r]] = cdf[0] - cdf[1]
        tail[r] = max(1.0 - pmf[r].sum(), tail_mass)
    return pmf, tail, length.astype(np.int32), (-half).astype(np.int32)


# -- Kumaraswamy (stick-breaking building block) -------------------------------
# Parity: reference nn/distributions/kumaraswamy.py, consumed by the
# stick-breaking GEM prior coder (prior_coder/__init__.py:4530-4636).
def kumaraswamy_mean(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """E[X] for X ~ Kumaraswamy(a, b): b * B(1 + 1/a, b)."""
    from jax.scipy.special import gammaln
    log_mean = (jnp.log(b) + gammaln(1.0 + 1.0 / a) + gammaln(b)
                - gammaln(1.0 + 1.0 / a + b))
    return jnp.exp(log_mean)


def kumaraswamy_sample(rng, a: jnp.ndarray, b: jnp.ndarray,
                       shape=None) -> jnp.ndarray:
    """Reparameterized sample via the closed-form inverse CDF."""
    shape = shape or jnp.broadcast_shapes(a.shape, b.shape)
    u = jax.random.uniform(rng, shape, minval=1e-6, maxval=1.0 - 1e-6)
    return (1.0 - (1.0 - u) ** (1.0 / b)) ** (1.0 / a)


def kumaraswamy_log_prob(x: jnp.ndarray, a: jnp.ndarray,
                         b: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    return (jnp.log(a) + jnp.log(b) + (a - 1.0) * jnp.log(x)
            + (b - 1.0) * jnp.log1p(-(x ** a)))
