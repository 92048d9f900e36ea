"""Parameter-generator framework.

Parity target: cbench/nn/models/param_generator.py — the reference's
generic generators that produce dynamic module parameters: index-driven
selection (IndexParameterGenerator / IndexSelectParameterGenerator),
stochastic Bernoulli masks, and NN predictors (ResNet2d / transformer)
mapping an input tensor to per-position parameters (used by the learned
topogroup predictor, param_generator.py:587).

TPU-first: index generators are host-side plain objects feeding STATIC jit
arguments (each choice is its own XLA specialization — the functional
analog of the reference's dynamic-module machinery); NN predictors are
flax modules that run inside the fused forward.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class IndexParameterGenerator:
    """index -> values[index]; sampling for training iteration.

    The reference's min_sample/max_sample contract maps to the index range;
    fix_for_inference pins eval to the default.
    """

    def __init__(self, values: Sequence[Any], default_index: int = -1,
                 fix_for_inference: bool = False):
        self.values = list(values)
        self.default_index = default_index % len(self.values)
        self.fix_for_inference = fix_for_inference

    @property
    def min_sample(self) -> int:
        return 0

    @property
    def max_sample(self) -> int:
        return len(self.values) - 1

    def __call__(self, index: Optional[int] = None):
        if index is None:
            index = self.default_index
        return self.values[int(index)]

    def sample(self, rng: np.random.Generator):
        return int(rng.integers(len(self.values)))

    def iterate(self):
        if self.fix_for_inference:
            return [self.default_index]
        return list(range(len(self.values)))


class IndexSelectParameterGenerator(IndexParameterGenerator):
    """index -> a slice of a parameter tensor along `axis` (the reference's
    IndexSelect variant selecting rows of a stacked parameter bank)."""

    def __init__(self, bank: jnp.ndarray, axis: int = 0, **kwargs):
        self.bank = jnp.asarray(bank)
        self.axis = axis
        super().__init__(list(range(self.bank.shape[axis])), **kwargs)

    def __call__(self, index: Optional[int] = None):
        if index is None:
            index = self.default_index
        return jnp.take(self.bank, int(index), axis=self.axis)


class BernoulliParameterGenerator(nn.Module):
    """Learned per-slot Bernoulli mask with straight-through sampling:
    training samples hard 0/1 gates with sigmoid gradients; eval thresholds
    at 0.5 (reference's stochastic structure-selection generator)."""

    num_slots: int
    init_logit: float = 2.0  # start mostly-on

    @nn.compact
    def __call__(self, rng: Optional[jax.Array] = None,
                 training: bool = True):
        logits = self.param("gate_logits",
                            nn.initializers.constant(self.init_logit),
                            (self.num_slots,))
        probs = jax.nn.sigmoid(logits)
        if training:
            if rng is None:
                raise ValueError("training sampling needs rng")
            u = jax.random.uniform(rng, probs.shape)
            hard = (u < probs).astype(probs.dtype)
            return hard + probs - jax.lax.stop_gradient(probs)
        return (probs > 0.5).astype(probs.dtype)


class ConvPredictorParameterGenerator(nn.Module):
    """Conv predictor: input tensor -> per-position parameter maps (the
    ResNet2d topo-group predictor generalized; param_generator.py:587)."""

    out_channels: int
    hidden: int = 128
    depth: int = 2
    residual: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden, (3, 3), padding="SAME")(x)
        for _ in range(self.depth):
            r = nn.Conv(self.hidden, (3, 3), padding="SAME")(
                nn.leaky_relu(h))
            h = h + r if self.residual else r
        return nn.Conv(self.out_channels, (1, 1))(nn.leaky_relu(h))


class TransformerPredictorParameterGenerator(nn.Module):
    """Transformer predictor over spatial tokens (the reference's
    transformer generator variant) — EntroFormerContext without masking."""

    out_channels: int
    dim_embed: int = 96
    depth: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        from .attention import EntroFormerContext
        return EntroFormerContext(
            out_channels=self.out_channels, dim_embed=self.dim_embed,
            depth=self.depth, heads=self.heads)(x)
