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


def thermo_loss(log_weight: jnp.ndarray, log_q: jnp.ndarray,
                num_particles: int, num_partitions: int = 5) -> jnp.ndarray:
    """Thermodynamic variational objective (TVO, Masrani et al. 2019) —
    the reference's "thermo" estimator option (pgm_coder.py MC-sampled
    training modes). Left-Riemann sum over inverse-temperature partitions
    of E_{pi_beta}[log w], each expectation estimated by self-normalized
    importance weighting of the K samples with weights w^beta, with the
    REINFORCE-style score term carrying the gradient to log_q."""
    K = num_particles
    betas = jnp.linspace(0.0, 1.0, num_partitions + 1)[:-1]     # left points
    dbeta = 1.0 / num_partitions

    def partition_term(beta):
        # pi_beta weights ∝ w^beta (self-normalized over the K samples)
        logit = beta * jax.lax.stop_gradient(log_weight)
        snis = jax.nn.softmax(logit, axis=1)                    # (B, K)
        e_logw = jnp.sum(snis * log_weight, axis=1)             # (B,)
        # covariance-style score term: Cov_pi[log w, log q] carries the
        # gradient through the discrete sampling distribution.
        e_logq = jnp.sum(snis * log_q, axis=1)
        cov = jnp.sum(snis * jax.lax.stop_gradient(log_weight)
                      * log_q, axis=1) \
            - jax.lax.stop_gradient(e_logw) * e_logq
        return e_logw + cov - jax.lax.stop_gradient(cov)

    terms = jax.vmap(partition_term)(betas)                     # (P, B)
    return -jnp.mean(jnp.sum(terms * dbeta, axis=0))


def mc_loss(estimator: str, log_weight: jnp.ndarray, log_q: jnp.ndarray,
            num_particles: int) -> jnp.ndarray:
    if estimator == "reinforce":
        return reinforce_loss(log_weight, log_q, num_particles)
    if estimator == "vimco":
        return vimco_loss(log_weight, log_q, num_particles)
    if estimator == "thermo":
        return thermo_loss(log_weight, log_q, num_particles)
    raise ValueError(f"unknown MC estimator {estimator!r}")
