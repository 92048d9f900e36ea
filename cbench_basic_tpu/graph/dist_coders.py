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
