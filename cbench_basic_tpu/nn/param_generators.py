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


class IdentityParameterGenerator:
    """Pass-through (reference param_generator.py:17)."""

    def __call__(self, param, *args, **kwargs):
        return param


class NNParameterGenerator(nn.Module):
    """A bare learned tensor of a given shape (reference
    param_generator.py:22-71): init zeros/ones/normal/value; freeze via
    stop_gradient (the functional analog of requires_grad=False);
    no_params/training_no_params return None."""

    shape: tuple = ()
    init_method: str = "zeros"
    init_value: Optional[Any] = None
    freeze_params: bool = False
    no_params: bool = False
    training_no_params: bool = False

    @nn.compact
    def __call__(self, training: bool = False):
        if self.no_params or (training and self.training_no_params):
            return None
        if self.init_method == "zeros":
            init = nn.initializers.zeros
        elif self.init_method == "ones":
            init = nn.initializers.ones
        elif self.init_method == "normal":
            init = nn.initializers.normal(1.0)
        elif self.init_method == "value":
            val = jnp.asarray(self.init_value)
            init = lambda key, shape: jnp.broadcast_to(val, shape)
        else:
            raise ValueError(self.init_method)
        p = self.param("value", init, self.shape)
        return jax.lax.stop_gradient(p) if self.freeze_params else p


class GroupedParameterGeneratorWrapper:
    """List of generators -> list of outputs (reference :118-125)."""

    def __init__(self, generators: Sequence[Any]):
        self.generators = list(generators)

    def __call__(self, **kwargs):
        return [g(**kwargs) for g in self.generators]


class IncreasingVectorGenerator(nn.Module):
    """Monotone non-decreasing learned vector (reference
    IncreasingVectorGenerator :127-141). TPU-first redesign: instead of the
    reference's in-place data clamp after each step (a mutation the
    functional train step cannot express), monotonicity holds BY
    CONSTRUCTION — v[0] = minimum + softplus(b0), v[i] = v[i-1] +
    min_delta + softplus(d_i). Differentiable everywhere."""

    length: int = 4
    minimum: float = 0.0
    min_delta: float = 0.0

    @nn.compact
    def __call__(self):
        base = self.param("base", nn.initializers.zeros, ())
        deltas = self.param("deltas", nn.initializers.zeros,
                            (self.length - 1,))
        v0 = self.minimum + jax.nn.softplus(base)
        steps = self.min_delta + jax.nn.softplus(deltas)
        return jnp.concatenate([v0[None], v0 + jnp.cumsum(steps)])


class CategoricalParameterGenerator(nn.Module):
    """Learned categorical selection weights (reference :383-443): relaxed
    Gumbel-softmax sample while training, hard one-hot argmax at eval."""

    shape: tuple = ()
    num_categories: int = 2
    gs_temp: float = 0.5
    default_logits: Optional[tuple] = None
    freeze_params: bool = False

    @nn.compact
    def __call__(self, logits=None, training: bool = False, rng=None):
        if logits is None:
            if self.default_logits is not None:
                dl = jnp.asarray(self.default_logits, jnp.float32)
                init = lambda key, shape: jnp.broadcast_to(dl, shape)
            else:
                init = nn.initializers.zeros
            logits = self.param("logits", init,
                                self.shape + (self.num_categories,))
            if self.freeze_params:
                logits = jax.lax.stop_gradient(logits)
        if training and not self.freeze_params:
            if rng is None:
                raise ValueError("training sample needs rng")
            g = jax.random.gumbel(rng, logits.shape, logits.dtype)
            return jax.nn.softmax((logits + g) / self.gs_temp, -1)
        return jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                              dtype=logits.dtype)


class CategoricalToRangeGenerator(nn.Module):
    """Categorical -> cumulative range weights, e.g. one-hot [0,0,1,0] ->
    [1,1,1,0] (reference :445-488): weights @ lower-triangular ones."""

    shape: tuple = ()
    num_categories: int = 2
    gs_temp: float = 0.5
    default_logits: Optional[tuple] = None

    @nn.compact
    def __call__(self, logits=None, training: bool = False, rng=None):
        cat = CategoricalParameterGenerator(
            shape=self.shape, num_categories=self.num_categories,
            gs_temp=self.gs_temp, default_logits=self.default_logits,
            name="cat")(logits=logits, training=training, rng=rng)
        tri = jnp.tril(jnp.ones((self.num_categories, self.num_categories),
                                cat.dtype), 0)
        # range[j] = sum_{i >= j} w[i]  (w @ tri with tri[i, j] = i >= j)
        return cat @ tri


class TensorSplitGenerator:
    """Split an input tensor along an axis, optionally select one split and
    softmax it (reference :490-507)."""

    def __init__(self, num_or_sections, axis: int = 0,
                 index: Optional[int] = None,
                 postprocess: Optional[str] = None):
        self.num_or_sections = num_or_sections
        self.axis = axis
        self.index = index
        self.postprocess = postprocess

    def __call__(self, value, index: Optional[int] = None):
        if index is None:
            index = self.index
        if isinstance(self.num_or_sections, int):
            splits = jnp.split(value, self.num_or_sections, axis=self.axis)
        else:
            splits = jnp.split(value, np.cumsum(self.num_or_sections)[:-1],
                               axis=self.axis)
        result = splits if index is None else splits[int(index)]
        if self.postprocess == "softmax":
            result = jax.nn.softmax(result, axis=self.axis)
        return result


class IndexSelectParameterGeneratorWrapper(IndexParameterGenerator):
    """Index-select over a wrapped generator's OUTPUT (reference :295-330):
    the wrapped generator produces a bank tensor; selection slices it."""

    def __init__(self, generator, num_choices: int, axis: int = 0, **kwargs):
        super().__init__(values=list(range(num_choices)), **kwargs)
        self.generator = generator
        self.axis = axis

    def __call__(self, index: Optional[int] = None, **kwargs):
        if index is None:
            index = self.default_index
        bank = self.generator(**kwargs) if callable(self.generator) \
            else self.generator
        return jnp.take(bank, int(index), axis=self.axis)


class ConvTranspose2dParameterGenerator(nn.Module):
    """DCGAN-style generator: a learned latent seed upsampled through
    sub-pixel conv stages into a 2-D parameter map.

    Parity: ConvTranspose2dParameterGenerator (reference
    cbench/nn/layers/param_generator.py:509-535). TPU notes: transpose
    convs become dense conv + depth_to_space; BatchNorm becomes GroupNorm
    (no cross-batch stats under pjit).
    """

    in_channels: int = 64
    out_channels: int = 64
    base_size: int = 4
    num_upsamples: int = 4

    @nn.compact
    def __call__(self, z: Optional[jnp.ndarray] = None,
                 training: bool = False):
        if z is None:
            z = self.param("seed", nn.initializers.normal(1.0),
                           (1, 1, 1, self.in_channels))
        # latent -> base_size x base_size
        h = nn.ConvTranspose(self.in_channels * 8,
                             (self.base_size, self.base_size),
                             strides=(self.base_size, self.base_size),
                             use_bias=False)(z)
        h = nn.relu(nn.GroupNorm(num_groups=8)(h))
        c = self.in_channels * 4
        for _ in range(self.num_upsamples - 1):
            y = nn.Conv(c * 4, (4, 4), padding="SAME", use_bias=False)(h)
            n, hh, ww, _ = y.shape
            y = y.reshape(n, hh, ww, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
            h = nn.relu(nn.GroupNorm(num_groups=min(8, c))(
                y.reshape(n, hh * 2, ww * 2, c)))
            c = max(c // 2, self.out_channels)
        y = nn.Conv(self.out_channels * 4, (4, 4), padding="SAME",
                    use_bias=False)(h)
        n, hh, ww, _ = y.shape
        y = y.reshape(n, hh, ww, self.out_channels, 2, 2)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return jnp.tanh(y.reshape(n, hh * 2, ww * 2, self.out_channels))


class NNModuleParameterWrapper:
    """Expose a flax module's parameter pytree as generated parameters.

    Parity: NNModuleParameterWrapper (reference param_generator.py:73-110
    — wraps module.named_parameters() with optional name filtering and
    freezing). Functional JAX analog: parameters are materialized once
    from the module's init and cached; freeze_params stops gradients.
    """

    def __init__(self, module, input_shape=(1, 8, 8, 3), name_filter=None,
                 freeze_params: bool = False, seed: int = 0):
        self.module = module
        self.input_shape = tuple(input_shape)
        self.name_filter = name_filter
        self.freeze_params = freeze_params
        self.seed = seed
        self._params = None

    def init_params(self):
        if self._params is None:
            variables = self.module.init(
                jax.random.PRNGKey(self.seed),
                jnp.zeros(self.input_shape, jnp.float32))
            params = variables.get("params", variables)
            if self.name_filter:
                params = {k: v for k, v in params.items()
                          if self.name_filter in k}
            self._params = params
        return self._params

    def __call__(self, params=None, training: bool = False):
        p = params if params is not None else self.init_params()
        if self.freeze_params:
            p = jax.tree_util.tree_map(jax.lax.stop_gradient, p)
        return p
