"""Slimmable (dynamic-width) layers and transforms + inter-node PGM edges.

Parity targets in the reference:
  * BaseSlimmableLayer / DynamicConv2d weight slicing + per-level FLOPs
    (slimmable_layers.py:32-206), DynamicGDN (:209-320).
  * SlimmableConv2dPGMModel (pgm_layers.py:714-896): a learned categorical
    over width levels per edge; soft-weighted mixture of all levels while
    the pgm is uncertain during training, hard (static) level at inference;
    FLOPs accumulated weighted by pgm probabilities.
  * Slimmable hyperprior heads a/s/ha/hs (pgm_layers.py:898-1270) with
    mid_channels_list = [48, 72, 96, 144, 192].

TPU-first realization: weights live at max width; an ACTIVE LEVEL is a
Python-static argument so each width compiles to its own dense XLA program
(no dynamic shapes on the MXU). Soft-mixture training evaluates all levels
(static unroll) and mixes by pgm probabilities. FLOPs are analytic
per-level constants — no runtime hooks needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import NonNegativeParam

DEFAULT_WIDTHS = (48, 72, 96, 144, 192)


class SlimmableConv(nn.Module):
    """Conv whose output width is selected per call from features_list.

    Input width is whatever the caller provides (already sliced upstream);
    weights are stored at (max_in, max_out) and sliced statically.
    """

    features_list: Sequence[int]
    max_in: int
    kernel: int = 5
    stride: int = 2
    transpose: bool = False

    @nn.compact
    def __call__(self, x, level: int):
        out_c = self.features_list[level]
        in_c = x.shape[-1]
        k = self.kernel
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, self.max_in, max(self.features_list)))
        bias = self.param("bias", nn.initializers.zeros,
                          (max(self.features_list),))
        w = kernel[:, :, :in_c, :out_c]
        b = bias[:out_c]
        if self.transpose:
            out = jax.lax.conv_transpose(
                x, w, (self.stride, self.stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            out = jax.lax.conv_general_dilated(
                x, w, (self.stride, self.stride), "SAME", dimension_numbers=dn)
        return out + b

    def flops(self, in_shape, level: int) -> float:
        """MACs*2 for the sliced conv at this level."""
        h, w = in_shape[1], in_shape[2]
        if not self.transpose:
            h, w = h // self.stride, w // self.stride
        else:
            h, w = h * self.stride, w * self.stride
        in_c = in_shape[-1]
        return 2.0 * self.kernel * self.kernel * in_c * \
            self.features_list[level] * h * w


class SlimmableGDN(nn.Module):
    """GDN over at-most max_channels; active width = input width."""

    max_channels: int
    inverse: bool = False
    beta_min: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_full = NonNegativeParam(
            (self.max_channels,), lambda k: jnp.ones((self.max_channels,)),
            minimum=self.beta_min, name="beta")()
        gamma_full = NonNegativeParam(
            (self.max_channels, self.max_channels),
            lambda k: 0.1 * jnp.eye(self.max_channels), name="gamma")()
        beta = beta_full[:c]
        gamma = gamma_full[:c, :c]
        norm = jnp.sqrt(jax.lax.dot_general(
            x * x, gamma, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + beta)
        return x * norm if self.inverse else x / norm


class SlimmableAnalysisTransform(nn.Module):
    """g_a with slimmable mid widths: conv(w)+GDN ×3 then conv(M)."""

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192

    def setup(self):
        mw = max(self.widths)
        self.conv1 = SlimmableConv(self.widths, max_in=3)
        self.gdn1 = SlimmableGDN(mw)
        self.conv2 = SlimmableConv(self.widths, max_in=mw)
        self.gdn2 = SlimmableGDN(mw)
        self.conv3 = SlimmableConv(self.widths, max_in=mw)
        self.gdn3 = SlimmableGDN(mw)
        self.conv4 = SlimmableConv((self.M,), max_in=mw)

    def __call__(self, x, level: int = 0):
        x = self.gdn1(self.conv1(x, level))
        x = self.gdn2(self.conv2(x, level))
        x = self.gdn3(self.conv3(x, level))
        return self.conv4(x, 0)

    def flops(self, in_shape, level: int) -> float:
        # Static-attr arithmetic only (callable on unbound modules).
        wl = self.widths[level]
        h, w = in_shape[1], in_shape[2]
        total, in_c = 0.0, in_shape[-1]
        for _ in range(3):
            h, w = h // 2, w // 2
            total += 2.0 * 25 * in_c * wl * h * w
            in_c = wl
        total += 2.0 * 25 * in_c * self.M * (h // 2) * (w // 2)
        return total


class SlimmableSynthesisTransform(nn.Module):
    """g_s with slimmable mid widths: deconv(w)+IGDN ×3 then deconv(3)."""

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    out_channels: int = 3

    def setup(self):
        mw = max(self.widths)
        self.conv1 = SlimmableConv(self.widths, max_in=self.M, transpose=True)
        self.gdn1 = SlimmableGDN(mw, inverse=True)
        self.conv2 = SlimmableConv(self.widths, max_in=mw, transpose=True)
        self.gdn2 = SlimmableGDN(mw, inverse=True)
        self.conv3 = SlimmableConv(self.widths, max_in=mw, transpose=True)
        self.gdn3 = SlimmableGDN(mw, inverse=True)
        self.conv4 = SlimmableConv((self.out_channels,), max_in=mw, transpose=True)

    def __call__(self, y, level: int = 0):
        y = self.gdn1(self.conv1(y, level))
        y = self.gdn2(self.conv2(y, level))
        y = self.gdn3(self.conv3(y, level))
        return self.conv4(y, 0)

    def flops(self, in_shape, level: int) -> float:
        wl = self.widths[level]
        h, w = in_shape[1], in_shape[2]
        total, in_c = 0.0, in_shape[-1]
        for _ in range(3):
            h, w = h * 2, w * 2
            total += 2.0 * 25 * in_c * wl * h * w
            in_c = wl
        total += 2.0 * 25 * in_c * self.out_channels * (h * 2) * (w * 2)
        return total


class SlimmableHyperAnalysisTransform(nn.Module):
    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    M: int = 192

    def setup(self):
        mw = max(self.widths)
        self.conv1 = SlimmableConv(self.widths, max_in=self.M, kernel=3, stride=1)
        self.conv2 = SlimmableConv(self.widths, max_in=mw)
        self.conv3 = SlimmableConv((self.N,), max_in=mw)

    def __call__(self, y, level: int = 0):
        y = nn.leaky_relu(self.conv1(y, level))
        y = nn.leaky_relu(self.conv2(y, level))
        return self.conv3(y, 0)

    def flops(self, in_shape, level: int) -> float:
        wl = self.widths[level]
        h, w = in_shape[1], in_shape[2]
        total = 2.0 * 9 * in_shape[-1] * wl * h * w
        total += 2.0 * 25 * wl * wl * (h // 2) * (w // 2)
        total += 2.0 * 25 * wl * self.N * (h // 4) * (w // 4)
        return total


class SlimmableHyperSynthesisTransform(nn.Module):
    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    out_channels: int = 384

    def setup(self):
        mw = max(self.widths)
        self.conv1 = SlimmableConv(self.widths, max_in=self.N, transpose=True)
        self.conv2 = SlimmableConv(self.widths, max_in=mw, transpose=True)
        self.conv3 = SlimmableConv((self.out_channels,), max_in=mw,
                                   kernel=3, stride=1)

    def __call__(self, z, level: int = 0):
        z = nn.leaky_relu(self.conv1(z, level))
        z = nn.leaky_relu(self.conv2(z, level))
        return self.conv3(z, 0)

    def flops(self, in_shape, level: int) -> float:
        wl = self.widths[level]
        h, w = in_shape[1], in_shape[2]
        total = 2.0 * 25 * in_shape[-1] * wl * (h * 2) * (w * 2)
        total += 2.0 * 25 * wl * wl * (h * 4) * (w * 4)
        total += 2.0 * 9 * wl * self.out_channels * (h * 4) * (w * 4)
        return total


class PGMSlimmableEdge(nn.Module):
    """Inter-node BayesNet edge: a slimmable transform whose active width is
    chosen by a learned categorical (the edge's pgm).

    Call modes:
      * level=<int> (static): hard single-width path — inference/coding.
      * soft=True: mixture over all levels weighted by softmax(logits)
        (optionally externally-supplied weights) — training.

    Returns (output, expected_flops) where expected_flops is a traced scalar
    (soft mode) or a Python float (hard mode). Parity:
    SlimmableConv2dPGMModel._forward_slimmable + weighted total_ops
    (pgm_layers.py:781-895).
    """

    transform: nn.Module
    num_levels: int = len(DEFAULT_WIDTHS)
    logits_init: float = 0.0

    def setup(self):
        self.pgm_logits = self.param(
            "pgm_logits", lambda key: jnp.full((self.num_levels,),
                                               self.logits_init))

    def pgm_probs(self):
        return jax.nn.softmax(self.pgm_logits)

    def __call__(self, x, level: Optional[int] = None, soft: bool = False,
                 weights: Optional[jnp.ndarray] = None):
        if level is not None:
            out = self.transform(x, level)
            return out, float(self.transform.flops(x.shape, level))
        if not soft and weights is None:
            # Hard argmax path would be data-dependent; default to the
            # highest-quality level for safety outside training.
            out = self.transform(x, self.num_levels - 1)
            return out, float(self.transform.flops(x.shape, self.num_levels - 1))
        w = weights if weights is not None else self.pgm_probs()
        outs = [self.transform(x, l) for l in range(self.num_levels)]
        out = sum(w[l] * outs[l] for l in range(self.num_levels))
        flops = sum(w[l] * self.transform.flops(x.shape, l)
                    for l in range(self.num_levels))
        return out, flops
