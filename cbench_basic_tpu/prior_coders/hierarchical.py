"""Hierarchical prior coders.

Parity target: HierarchicalNNPriorCoder / Hierarchical2LayerNNPriorCoder
(reference prior_coder/__init__.py:103-240): an outer latent coded
conditionally on an inner latent, with down/up transforms between levels.

In this framework the latent-graph engine IS the hierarchy mechanism (the
z-over-y hyperprior is exactly a 2-layer hierarchical coder), so real coding
of a hierarchy is expressed as graph nodes — `hierarchical_graph_nodes`
builds that wiring. The wrapper module below additionally provides the
reference's single-module API (one node that internally runs both layers)
for training / rate estimation, returning the two layers' likelihoods
flattened into one tensor so bpp accounts for both."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class HierarchicalPriorCoder(nn.Module):
    """Generic N-layer hierarchy (reference HierarchicalNNPriorCoder
    :103-222): layer 0 is the outermost latent; encoders[i] maps layer i's
    posterior features down to layer i+1's, and after the innermost coder
    runs, decoders[i] maps layer i+1's reconstruction up into layer i's
    prior. len(coders) == N, len(encoders) == len(decoders) == N-1.

    Training/rate API only (one fused forward, all layers' likelihoods
    concatenated so bpp sums the hierarchy, the reference's summed
    loss_rate :148-160); REAL coding of a hierarchy is expressed as
    latent-graph nodes via `hierarchical_graph_nodes` — the graph engine
    is this framework's hierarchy mechanism, and the z-over-y hyperprior
    is exactly the 2-layer instance."""

    coders: Sequence[nn.Module]     # N node coders, outermost first
    encoders: Sequence[nn.Module]   # N-1 down transforms
    decoders: Sequence[nn.Module]   # N-1 up transforms (inner recon -> prior)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        n = len(self.coders)
        assert len(self.encoders) == n - 1 and len(self.decoders) == n - 1
        rngs = (jax.random.split(rng, n) if rng is not None
                else [None] * n)

        # bottom-up: posterior features per layer
        feats = [value]
        for enc in self.encoders:
            feats.append(enc(feats[-1]))

        # top-down: code layer i conditioned on decoders[i](layer i+1)
        layer_prior = None
        outs = [None] * n
        for i in range(n - 1, -1, -1):
            if i == 0 and prior is not None:
                # an external prior conditions the outermost layer,
                # additive with the hierarchy's own (2-layer coder rule)
                layer_prior = (prior if layer_prior is None
                               else layer_prior + prior)
            outs[i] = self.coders[i](feats[i], prior=layer_prior,
                                     training=training, rng=rngs[i])
            if i > 0:
                layer_prior = self.decoders[i - 1](outs[i]["value_hat"])

        b = value.shape[0]
        lik = jnp.concatenate(
            [o["likelihood"].reshape(b, -1) for o in outs], axis=-1)
        result = {"value_hat": outs[0]["value_hat"], "likelihood": lik}
        for i, o in enumerate(outs):
            for k, v in o.items():
                if k.startswith("loss_"):
                    result[f"{k}_l{i}"] = v
        return result


class Hierarchical2LayerPriorCoder(nn.Module):
    """outer(value | up(inner(down(value)))) as one node-coder module."""

    outer: nn.Module          # node coder taking a prior (e.g. GaussianCoder)
    inner: nn.Module          # prior-free codable coder (e.g. VQPriorCoder)
    down: nn.Module           # value -> inner posterior input
    up: nn.Module             # inner value_hat -> outer prior features

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        h = self.down(value)
        inner_out = self.inner(h, training=training, rng=rngs[0])
        prior_feats = self.up(inner_out["value_hat"])
        if prior is not None:
            prior_feats = prior_feats + prior
        outer_out = self.outer(value, prior=prior_feats, training=training,
                               rng=rngs[1])

        n = value.shape[0]
        lik = jnp.concatenate(
            [outer_out["likelihood"].reshape(n, -1),
             inner_out["likelihood"].reshape(n, -1)], axis=-1)
        out = {"value_hat": outer_out["value_hat"], "likelihood": lik}
        for src, tag in ((inner_out, "inner"), (outer_out, "outer")):
            for k, v in src.items():
                if k.startswith("loss_"):
                    out[f"{k}_{tag}"] = v
        return out


def hierarchical_graph_nodes(name_outer: str, name_inner: str,
                             outer_coder, inner_coder, down, up):
    """Express the same hierarchy as latent-graph nodes/edges for REAL
    coding: returns (node_coders, edges, inference_wiring,
    generative_wiring, generative_order-fragment) dict pieces to merge into
    a LatentGraphModel build."""
    edge_down = f"{name_outer}_{name_inner}"
    edge_up = f"{name_inner}_{name_outer}"
    return {
        "node_coders": {name_outer: outer_coder, name_inner: inner_coder},
        "edges": {edge_down: down, edge_up: up},
        "inference_wiring": ((edge_down, name_outer, name_inner),),
        "generative_wiring": ((edge_up, name_inner, name_outer),),
        "generative_order": (name_inner, name_outer),
    }
