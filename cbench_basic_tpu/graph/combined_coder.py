"""Combined (dynamic) entropy coder: N intra-node AR coders blended during
training, one selected at coding time.

Parity target: CombinedNNTrainablePGMPriorCoder (reference
pgm_coder.py:632+) wired as the preset
`...-combined-dynamic-entropy-coder-grouped`
(lossy_latent_graph_scalable_ar_models.py:761): the blend weights act as a
dynamic entropy-coder selector, giving a complexity axis over CONTEXT-MODEL
structure (e.g. 2-step checkerboard vs 10-step ELIC) on top of the
slimmable-width axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .topogroup import TopoGroupGaussianCoder


class CombinedTopoGroupCoder(nn.Module):
    """Blend of TopoGroupGaussianCoder variants over one latent node.

    Training: shared noisy latent, per-coder likelihoods mixed by
    softmax(blend_logits) — a mixture-of-entropy-models rate.
    Coding: a single active sub-coder (host-selected via the codec's
    complexity table; defaults to the argmax blend weight).
    """

    channels: int
    patterns: Tuple[str, ...] = ("checkerboard", "elic")
    channel_groups: Tuple[int, ...] = (1, 5)
    context_channels: int = 384

    def setup(self):
        self.coders = [
            TopoGroupGaussianCoder(
                channels=self.channels, pattern=p,
                num_channel_groups=g, context_channels=self.context_channels)
            for p, g in zip(self.patterns, self.channel_groups)
        ]
        self.blend_logits = self.param(
            "blend_logits", lambda key: jnp.zeros((len(self.patterns),)))

    @property
    def num_coders(self) -> int:
        return len(self.patterns)

    def blend_weights(self):
        return jax.nn.softmax(self.blend_logits)

    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None):
        if prior is None:
            raise ValueError("combined coder needs a prior")
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            y_q = value + jax.random.uniform(rng, value.shape,
                                             minval=-0.5, maxval=0.5)
        else:
            y_q = value + jax.lax.stop_gradient(jnp.round(value) - value)

        w = self.blend_weights()
        lik = 0.0
        for i, coder in enumerate(self.coders):
            gmap, num_groups = coder._gmap(value.shape)
            ctx = coder._causal_context(y_q, gmap, num_groups)
            scales, means = coder._params(prior, ctx)
            lik = lik + w[i] * coder.gaussian.likelihood(y_q, scales, means)
        return {"value_hat": y_q, "likelihood": lik}

    # -- coding-path plumbing -------------------------------------------------
    def pmf_table(self):
        # All sub-coders share the default Gaussian scale table.
        return self.coders[0].pmf_table()

    def sub(self, idx: int) -> TopoGroupGaussianCoder:
        return self.coders[idx]

    def default_coder_idx(self, params_blend=None) -> int:
        return 0

    # Host hooks: delegate to the selected sub-coder. The codec stores the
    # active index in codec._node_coder_choice (from the complexity table).
    def _active_idx(self, codec, node) -> int:
        return int(getattr(codec, "_node_coder_choice", {}).get(node, 0))

    def host_encode(self, codec, node, value, prior, pair):
        idx = self._active_idx(codec, node)
        coder = _sub_descriptor(self, idx)
        gmap, masks = coder._host_gmap(
            _SubCodecProxy(codec, node, idx), node, prior, value.shape)
        y_hat, symbols, indexes = codec._node_fn(
            codec.params, node, ("sub", idx, "encode_all_groups"),
            value, prior, gmap)
        import numpy as np
        symbols = np.asarray(symbols).reshape(-1)
        indexes = np.asarray(indexes).reshape(-1)
        order = np.concatenate([m for m in masks if m.size])
        stream = pair.enc.encode_with_indexes(symbols[order], indexes[order])
        # Prefix one byte selecting the coder (decoder must know the AR
        # structure) — the dynamic-entropy-coder header.
        return bytes([idx]) + stream, y_hat

    def host_decode(self, codec, node, stream, prior, shape, pair):
        import numpy as np
        idx = stream[0]
        stream = stream[1:]
        coder = _sub_descriptor(self, idx)
        gmap, masks = coder._host_gmap(
            _SubCodecProxy(codec, node, idx), node, prior, shape)
        pair.dec.set_stream(stream)
        y_hat = jnp.zeros(shape, jnp.float32)
        for g, mask in enumerate(masks):
            if mask.size == 0:
                continue
            flat_idx = jnp.asarray(mask)
            idx_g, means_g = codec._node_fn(
                codec.params, node, ("sub", idx, "decode_group_gather"),
                y_hat, prior, jnp.int32(g), flat_idx, gmap)
            syms = pair.dec.decode_stream(np.asarray(idx_g))
            y_hat = codec._node_fn(
                codec.params, node, ("sub", idx, "decode_scatter"),
                y_hat, jnp.asarray(syms), means_g, flat_idx)
        return y_hat


def _sub_descriptor(combined: "CombinedTopoGroupCoder",
                    idx: int) -> TopoGroupGaussianCoder:
    """Unbound, attr-only clone of sub-coder idx for host-side mask/shape
    logic. A free function (NOT a module method): flax wraps module methods,
    and constructing a child module inside a wrapped unbound method trips
    the scope assertion."""
    return TopoGroupGaussianCoder(
        channels=combined.channels, pattern=combined.patterns[idx],
        num_channel_groups=combined.channel_groups[idx],
        context_channels=combined.context_channels,
        parent=None)


class _SubCodecProxy:
    """Adapter letting a sub-coder's _host_gmap route its jitted calls
    through the parent combined coder's node methods."""

    def __init__(self, codec, node, idx):
        self._codec = codec
        self._node = node
        self._idx = idx
        self.params = codec.params

    def _node_fn(self, params, node, method, *args):
        return self._codec._node_fn(params, node, ("sub", self._idx, method),
                                    *args)
