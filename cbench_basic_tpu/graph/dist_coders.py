"""Parametric-grid distribution entropy coders.

Parity target: cbench/modules/entropy_coder/dist_entropy.py (1023 LoC) —
DistributionEntropyCoder's scheme: a static GRID of distribution parameters
(`_init_dist_params`), per-element nearest-grid-row selection from the prior
(`_select_best_indexes`), truncated PMF rows per grid point
(`_truncated_dist_to_logits` -> `_get_ans_params`), rANS-coded symbols; and
VQClusteredEntropyCoder (:853) which replaces the regular grid with k-means
clusters of the observed prior parameters.

TPU-first: grid selection is pure elementwise math in the fused coding
passes (no host loops); the PMF grid is exported once at update_state time
through the standard pmf-row pipeline (nn/distributions.pmf_table_for_grid).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.distributions import (
    discretized_gaussian_likelihood,
    discretized_logistic_likelihood,
    pmf_table_for_grid,
)
from ..nn.layers import lower_bound


class DistributionGridCoder(nn.Module):
    """Conditional coder over a (loc-fraction × scale) parameter grid.

    The prior provides per-element (scale, loc). Coding splits loc into an
    integer part (removed from the symbol, recovered from the prior at
    decode) and a fractional part quantized onto `loc_bins` grid centers;
    scale quantizes onto `scale_bins` log-spaced centers. Each grid point
    owns one rANS table row. Unlike GaussianCoder (which removes the full
    mean), the fractional grid keeps sub-integer location information in the
    table — the reference's quantized-prior coding scheme
    (dist_entropy.py:92-111, 750-784).
    """

    channels: int
    kind: str = "gaussian"     # "gaussian" | "logistic"
    loc_bins: int = 8
    scale_bins: int = 48
    scale_min: float = 0.05
    scale_max: float = 32.0
    use_merger: bool = False

    def setup(self):
        if self.kind not in ("gaussian", "logistic"):
            raise ValueError(self.kind)
        if self.use_merger:
            self.merger = nn.Sequential([
                nn.Conv(self.channels * 2, (1, 1)), nn.leaky_relu,
                nn.Conv(self.channels * 2, (1, 1)),
            ])

    # -- grids -----------------------------------------------------------------
    def _scale_centers(self) -> np.ndarray:
        return np.exp(np.linspace(np.log(self.scale_min),
                                  np.log(self.scale_max), self.scale_bins))

    def _frac_centers(self) -> np.ndarray:
        # loc_bins centers covering [-0.5, 0.5)
        return (np.arange(self.loc_bins) + 0.5) / self.loc_bins - 0.5

    def _params_from_prior(self, prior):
        if self.use_merger:
            prior = self.merger(prior)
        scales, means = jnp.split(prior, 2, axis=-1)
        return lower_bound(jnp.abs(scales), 1e-6), means

    # -- training --------------------------------------------------------------
    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        scales, means = self._params_from_prior(prior)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            v_hat = value + jax.random.uniform(rng, value.shape,
                                               minval=-0.5, maxval=0.5)
        else:
            v_hat = value + jax.lax.stop_gradient(jnp.round(value) - value)
        f = (discretized_gaussian_likelihood if self.kind == "gaussian"
             else discretized_logistic_likelihood)
        lik = f(v_hat, means, scales)
        return {"value_hat": v_hat, "likelihood": lik}

    # -- coding (GaussianCoder-protocol: coding_params/symbols/dequantize) -----
    def pmf_table(self):
        """Grid rows: index = frac_bin * scale_bins + scale_bin."""
        fr = self._frac_centers()
        sc = self._scale_centers()
        locs = np.repeat(fr, self.scale_bins)
        scales = np.tile(sc, self.loc_bins)
        pmf, tail, lengths, offsets = pmf_table_for_grid(
            self.kind if self.kind == "logistic" else "gaussian",
            locs, scales)
        return (jnp.asarray(pmf), jnp.asarray(tail),
                jnp.asarray(lengths), jnp.asarray(offsets))

    def _grid_select(self, prior):
        scales, means = self._params_from_prior(prior)
        loc_int = jnp.round(means)
        frac = means - loc_int                                # [-0.5, 0.5)
        frac_bin = jnp.clip(
            jnp.floor((frac + 0.5) * self.loc_bins),
            0, self.loc_bins - 1).astype(jnp.int32)
        log_s = jnp.log(jnp.clip(scales, self.scale_min, self.scale_max))
        t = ((log_s - np.log(self.scale_min))
             / (np.log(self.scale_max) - np.log(self.scale_min)))
        scale_bin = jnp.clip(jnp.round(t * (self.scale_bins - 1)),
                             0, self.scale_bins - 1).astype(jnp.int32)
        return frac_bin * self.scale_bins + scale_bin, loc_int

    def coding_params(self, prior):
        return self._grid_select(prior)

    def symbols(self, value, prior):
        _, loc_int = self._grid_select(prior)
        return jnp.round(value - loc_int).astype(jnp.int32)

    def dequantize(self, symbols, prior):
        _, loc_int = self._grid_select(prior)
        return symbols.astype(jnp.float32) + loc_int


class MixtureClusteredCoder(nn.Module):
    """K-component mixture conditional coder with k-means-clustered tables.

    Closes the mixture-CODING gap of the grid family: the prior provides
    per-element mixture parameters (weights logits, locs, scales) for K
    components; a product grid over all parameters is intractable, so the
    observed (w, loc-frac, log-scale) parameter VECTORS are k-means
    clustered (fit_clusters, the VQClusteredEntropyCoder idea extended to
    mixtures) and each cluster centroid owns one truncated-mixture PMF row.
    The integer part of the WEIGHTED MEAN is removed from the symbol
    (recovered from the prior at decode). Training uses the exact
    discretized mixture likelihood.

    Prior layout: (..., K) weights ++ (..., K) locs ++ (..., K) scales per
    channel, flattened channel-major: prior[..., c*3K:(c+1)*3K].
    """

    channels: int
    num_components: int = 3
    kind: str = "logistic"
    num_clusters: int = 128
    symbol_half_range: int = 32
    cluster_params: Optional[tuple] = None  # host-fitted (C_k, 3K) centroids

    def _params_from_prior(self, prior):
        K = self.num_components
        p = prior.reshape(prior.shape[:-1] + (self.channels, 3 * K))
        w, locs, scales = jnp.split(p, 3, axis=-1)
        return (jax.nn.softmax(w, -1), locs,
                lower_bound(jnp.abs(scales), 1e-3))

    def _mixture_mean(self, w, locs):
        return jnp.sum(w * locs, -1)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        from ..nn.distributions import discretized_mixture_likelihood
        w, locs, scales = self._params_from_prior(prior)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            v_hat = value + jax.random.uniform(rng, value.shape,
                                               minval=-0.5, maxval=0.5)
        else:
            v_hat = value + jax.lax.stop_gradient(jnp.round(value) - value)
        lik = discretized_mixture_likelihood(
            v_hat, jnp.log(w + 1e-12), locs, scales, kind=self.kind)
        return {"value_hat": v_hat, "likelihood": lik}

    # -- clustering ------------------------------------------------------------
    @staticmethod
    def fit_clusters(weights: np.ndarray, fracs: np.ndarray,
                     scales: np.ndarray, num_clusters: int = 128,
                     iters: int = 10, seed: int = 0) -> np.ndarray:
        """k-means over observed (w, loc-frac, log-scale) mixture vectors.
        weights/fracs: (N, K); scales: (N, K). Returns (C, 3K) centroids
        [w.. , frac.. , log-scale..]."""
        pts = np.concatenate([
            np.asarray(weights, np.float64),
            np.asarray(fracs, np.float64),
            np.log(np.asarray(scales, np.float64))], -1)
        rng = np.random.default_rng(seed)
        centers = pts[rng.choice(len(pts), size=min(num_clusters, len(pts)),
                                 replace=False)]
        for _ in range(iters):
            d = ((pts[:, None] - centers[None]) ** 2).sum(-1)
            assign = d.argmin(1)
            for k in range(len(centers)):
                sel = pts[assign == k]
                if len(sel):
                    centers[k] = sel.mean(0)
        return centers

    def _centroids(self) -> np.ndarray:
        if self.cluster_params is not None:
            return np.asarray(self.cluster_params, np.float64)
        # default grid: single-component-dominant centroids over a small
        # (frac x scale) lattice (usable before fitting)
        K = self.num_components
        fr = np.linspace(-0.4, 0.4, 4)
        sc = np.exp(np.linspace(np.log(0.2), np.log(8.0), 8))
        rows = []
        for f in fr:
            for s in sc:
                w = np.full(K, 0.05 / max(K - 1, 1))
                w[0] = 0.95
                rows.append(np.concatenate([w, np.full(K, f),
                                            np.full(K, np.log(s))]))
        return np.stack(rows)

    # -- coding protocol (coding_params/symbols/dequantize + pmf_table) --------
    def pmf_table(self):
        from ..nn.distributions import (
            discretized_gaussian_likelihood,
            discretized_logistic_likelihood,
        )
        C = self._centroids()
        K = self.num_components
        H = self.symbol_half_range
        xs = np.arange(-H, H + 1, dtype=np.float64)
        rows = np.zeros((len(C), len(xs)))
        f = (discretized_logistic_likelihood if self.kind == "logistic"
             else discretized_gaussian_likelihood)
        for r, c in enumerate(C):
            w, frac, logs = c[:K], c[K:2 * K], c[2 * K:]
            lik = np.asarray(f(jnp.asarray(xs)[:, None], jnp.asarray(frac),
                               jnp.asarray(np.exp(logs))))
            rows[r] = (lik * w).sum(-1)
        rows = rows / rows.sum(-1, keepdims=True)
        n = len(C)
        return (jnp.asarray(rows), jnp.full((n,), 1e-9),
                jnp.full((n,), len(xs), jnp.int32),
                jnp.full((n,), -H, jnp.int32))

    def _select(self, prior):
        w, locs, scales = self._params_from_prior(prior)
        mean = self._mixture_mean(w, locs)
        loc_int = jnp.round(mean)
        frac = locs - loc_int[..., None]  # per-component frac around int
        feats = jnp.concatenate(
            [w, frac, jnp.log(scales)], -1)                   # (..., C, 3K)
        cent = jnp.asarray(self._centroids())                  # (Ck, 3K)
        d = jnp.sum((feats[..., None, :] - cent) ** 2, -1)
        return jnp.argmin(d, -1).astype(jnp.int32), loc_int

    def coding_params(self, prior):
        return self._select(prior)

    def symbols(self, value, prior):
        _, loc_int = self._select(prior)
        return jnp.clip(jnp.round(value - loc_int),
                        -self.symbol_half_range,
                        self.symbol_half_range).astype(jnp.int32)

    def dequantize(self, symbols, prior):
        _, loc_int = self._select(prior)
        return symbols.astype(jnp.float32) + loc_int


class VQClusteredCoder(DistributionGridCoder):
    """Distribution coder whose grid is k-means clusters of the OBSERVED
    prior parameters (reference VQClusteredEntropyCoder, dist_entropy.py:853)
    — the table adapts to where the model actually places (loc, scale) mass
    instead of a regular grid.

    fit_clusters(priors) must run before coding (update_state analog);
    cluster centers persist in `self.variables` would require mutable
    state, so they are returned and injected through `cluster_params`.
    """

    num_clusters: int = 64
    # host-fitted (K, 2) array [(frac, scale)]; None until fit
    cluster_params: Optional[tuple] = None

    def _clusters(self) -> np.ndarray:
        if self.cluster_params is None:
            # fall back to the regular grid as initial clusters
            fr = np.repeat(self._frac_centers(), self.scale_bins)
            sc = np.tile(self._scale_centers(), self.loc_bins)
            return np.stack([fr, sc], -1)[: self.num_clusters]
        return np.asarray(self.cluster_params)

    @staticmethod
    def fit_clusters(fracs: np.ndarray, scales: np.ndarray,
                     num_clusters: int = 64, iters: int = 10,
                     seed: int = 0) -> np.ndarray:
        """Plain k-means over observed (frac, log-scale) pairs (host)."""
        pts = np.stack([np.asarray(fracs).reshape(-1),
                        np.log(np.asarray(scales).reshape(-1))], -1)
        rng = np.random.default_rng(seed)
        centers = pts[rng.choice(len(pts), size=min(num_clusters, len(pts)),
                                 replace=False)]
        for _ in range(iters):
            d = ((pts[:, None] - centers[None]) ** 2).sum(-1)
            assign = d.argmin(1)
            for k in range(len(centers)):
                sel = pts[assign == k]
                if len(sel):
                    centers[k] = sel.mean(0)
        return np.stack([centers[:, 0], np.exp(centers[:, 1])], -1)

    def pmf_table(self):
        cl = self._clusters()
        pmf, tail, lengths, offsets = pmf_table_for_grid(
            self.kind if self.kind == "logistic" else "gaussian",
            cl[:, 0], cl[:, 1])
        return (jnp.asarray(pmf), jnp.asarray(tail),
                jnp.asarray(lengths), jnp.asarray(offsets))

    def _grid_select(self, prior):
        scales, means = self._params_from_prior(prior)
        loc_int = jnp.round(means)
        frac = means - loc_int
        cl = jnp.asarray(self._clusters())                    # (K, 2)
        d = ((frac[..., None] - cl[:, 0]) ** 2
             + (jnp.log(jnp.clip(scales, self.scale_min, self.scale_max))
                [..., None] - jnp.log(cl[:, 1])) ** 2)
        return jnp.argmin(d, -1).astype(jnp.int32), loc_int
