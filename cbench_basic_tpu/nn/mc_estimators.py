"""Score-function gradient estimators for discrete latent training.

Parity: the reference's estimator helpers (pgm_coder.py:70-135 —
get_reinforce_loss / get_vimco_loss over multi-sample log weights) shared by
the learned-topogroup predictor and the discrete prior-coder zoo.

Conventions: log_weight[b, k] is the per-sample model log-weight (e.g.
-rate nats of MC sample k), log_q[b, k] the sample's log-probability under
the inference distribution; K samples per batch element.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_evidence(log_weight: jnp.ndarray, num_particles: int) -> jnp.ndarray:
    return jax.nn.logsumexp(log_weight, axis=1) - jnp.log(num_particles)


def reinforce_loss(log_weight: jnp.ndarray, log_q: jnp.ndarray,
                   num_particles: int) -> jnp.ndarray:
    """Term 1 of eq. (2), arXiv:1805.10469 (reference get_reinforce_loss)."""
    le = log_evidence(log_weight, num_particles)
    corr = jax.lax.stop_gradient(le) * jnp.sum(log_q, axis=1)
    return -jnp.mean(corr)


def vimco_loss(log_weight: jnp.ndarray, log_q: jnp.ndarray,
               num_particles: int) -> jnp.ndarray:
    """VIMCO (Mnih & Rezende 2016) with the leave-one-out geometric-mean
    control variate (reference get_vimco_loss)."""
    K = num_particles
    lw_loo = (jnp.sum(log_weight, axis=1, keepdims=True) - log_weight) / (K - 1)
    # tmat[b, k, j] = log_weight[b, j], except j == k -> lw_loo[b, k];
    # control[b, k] = Upsilon_{-k} (below eq. 3 of the paper).
    eye = jnp.eye(K, dtype=bool)
    tmat = jnp.where(eye[None], lw_loo[:, :, None], log_weight[:, None, :])
    control = jax.nn.logsumexp(tmat, axis=2) - jnp.log(K)
    le = log_evidence(log_weight, K)
    signal = jax.lax.stop_gradient(le[:, None] - control)
    return -jnp.mean(jnp.sum(signal * log_q, axis=1))


def mc_loss(estimator: str, log_weight: jnp.ndarray, log_q: jnp.ndarray,
            num_particles: int) -> jnp.ndarray:
    if estimator == "reinforce":
        return reinforce_loss(log_weight, log_q, num_particles)
    if estimator == "vimco":
        return vimco_loss(log_weight, log_q, num_particles)
    raise ValueError(f"unknown MC estimator {estimator!r}")
