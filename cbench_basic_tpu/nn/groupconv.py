"""Group-conv PGM backbone transforms.

Parity target: the reference's GroupConv2dPGMModel hyperprior layers
(cbench/nn/layers/pgm_layers.py:181-320, wired by
configs/nnmodules/layers/pgm/hyperprior_{a,s,ha,hs}.py and used by the
"hyperprior-sc-groupconv-full-grouped" experiment,
configs/lossy_graph_scalable_exp_hp.py:522-571): channels are partitioned
into groups with per-group-independent conv stacks, and computational
scaling activates a growing number of groups instead of slimming widths.

TPU-first realization: every stage is ONE dense grouped conv
(feature_group_count=G — XLA tiles grouped convs onto the MXU directly);
the complexity level applies a static channel mask on the group boundary
(zeroed groups fold away at compile time per jit specialization) and a final
dense 1x1 mixes active groups into the output. No per-edge python modules,
no unfold: the whole stack compiles to a handful of fused convolutions.

Satisfies the PGMSlimmableEdge transform protocol: __call__(x, level) +
flops(in_shape, level), so the inter-node BayesNet machinery (soft mixture
training, hard coding paths, FLOPs loss) is shared with the slimmable-width
backbone (nn/slimmable.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _active_groups(level: int, groups: int, num_levels: int) -> int:
    """Monotone level -> number of active channel groups (top = all)."""
    if num_levels <= 1:
        return groups
    return max(1, min(groups, round((level + 1) * groups / num_levels)))


class _GroupedConv(nn.Module):
    """Conv with per-group-independent weights (feature_group_count)."""

    features: int
    groups: int
    kernel: int = 5
    stride: int = 2
    transpose: bool = False

    @nn.compact
    def __call__(self, x):
        if self.transpose:
            # flax ConvTranspose has no feature grouping; split-concat keeps
            # per-group independence (G small; XLA fuses the concat).
            per = self.features // self.groups
            cper = x.shape[-1] // self.groups
            outs = [
                nn.ConvTranspose(per, (self.kernel, self.kernel),
                                 strides=(self.stride, self.stride),
                                 padding="SAME", name=f"g{g}")(
                    x[..., g * cper:(g + 1) * cper])
                for g in range(self.groups)]
            return jnp.concatenate(outs, axis=-1)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding="SAME",
                       feature_group_count=self.groups)(x)


class GroupConvTransform(nn.Module):
    """Grouped hyperprior transform, kind in {"a", "s", "ha", "hs"}.

    kind "a": image -> latent (4 stride-2 stages), "s": inverse;
    "ha": latent -> hyper (1 + 2 stride-2), "hs": inverse.
    Complexity level activates ceil((l+1)G/L) groups; inactive groups are
    masked to zero at every stage (their parameters exist but the compiled
    program at that level never touches them — parity with the reference's
    inactive PGM group edges).
    """

    kind: str = "a"
    groups: int = 4
    num_levels: int = 5
    mid_per_group: int = 48
    in_channels: int = 3
    out_channels: int = 192
    # Cross-group aggregation placement (parity: the reference's
    # HyperpriorSynthesisAggregate*GroupConv2dPGMModel family,
    # pgm_layers.py:496-668): "out" = dense final conv only (agg_out),
    # "none" = fully grouped incl. the final conv (no_agg_out),
    # "pre" = dense 1x1 before stage 0 (agg_v2_pre), "post0/1/2" = dense
    # 1x1 after that stage (agg / agg_v2 / agg_v3).
    agg: str = "out"

    def _specs(self):
        """Static stage table: ((features, groups, kernel, stride,
        transpose), ...), final — derivable without setup so flops() works
        on unbound modules (the PGMSlimmableEdge transform protocol)."""
        G, mid = self.groups, self.groups * self.mid_per_group
        if self.kind == "a":
            specs = [(mid, 1, 5, 2, False), (mid, G, 5, 2, False),
                     (mid, G, 5, 2, False)]
            final = (self.out_channels, 5, 2, False)
        elif self.kind == "s":
            specs = [(mid, 1, 5, 2, True), (mid, G, 5, 2, True),
                     (mid, G, 5, 2, True)]
            final = (self.out_channels, 5, 2, True)
        elif self.kind == "ha":
            specs = [(mid, 1, 3, 1, False), (mid, G, 5, 2, False)]
            final = (self.out_channels, 5, 2, False)
        elif self.kind == "hs":
            specs = [(mid, 1, 5, 2, True), (mid, G, 5, 2, True)]
            final = (self.out_channels, 3, 1, False)
        else:
            raise ValueError(f"unknown kind {self.kind!r}")
        return specs, final

    def setup(self):
        specs, final = self._specs()
        self.stages = [
            _GroupedConv(features=f, groups=g, kernel=k, stride=s,
                         transpose=t, name=f"stage{i}")
            for i, (f, g, k, s, t) in enumerate(specs)]
        f, k, s, t = final
        final_groups = self._final_groups(f)
        self.mix = _GroupedConv(features=f, groups=final_groups, kernel=k,
                                stride=s, transpose=t, name="mix")
        if self.agg == "pre":
            self.agg_mix = nn.Conv(self.in_channels, (1, 1), name="agg_mix")
        elif self.agg.startswith("post"):
            mid = self.groups * self.mid_per_group
            self.agg_mix = nn.Conv(mid, (1, 1), name="agg_mix")
        else:
            self.agg_mix = None

    def _final_groups(self, features: int) -> int:
        """Grouped final conv only for agg="none" and a divisible width."""
        if self.agg == "none" and features % self.groups == 0:
            return self.groups
        return 1

    def _mask(self, level: int, channels: int):
        a = _active_groups(level, self.groups, self.num_levels)
        per = channels // self.groups
        m = jnp.zeros((channels,), jnp.float32).at[:a * per].set(1.0)
        return m

    def __call__(self, x, level: int = None):
        if level is None:
            level = self.num_levels - 1
        if self.agg == "pre":
            x = self.agg_mix(x)
        for i, st in enumerate(self.stages):
            x = nn.leaky_relu(st(x))
            if self.agg == f"post{i}":
                x = self.agg_mix(x)
            x = x * self._mask(level, x.shape[-1])
        return self.mix(x)

    def flops(self, in_shape, level: int) -> float:
        """Analytic MACs*2 from the static spec table (callable on unbound
        modules); grouped stages scale with the active-group fraction."""
        a = _active_groups(level, self.groups, self.num_levels)
        frac = a / self.groups
        specs, final = self._specs()
        h, w = in_shape[1], in_shape[2]
        total = 0.0
        in_c = in_shape[-1]
        for features, g, kernel, stride, transpose in specs:
            oh = h * stride if transpose else h // stride
            ow = w * stride if transpose else w // stride
            total += (2.0 * kernel * kernel * (in_c // g)
                      * features * oh * ow) * frac
            h, w, in_c = oh, ow, features
        f, k, s, t = final
        oh, ow = (h * s, w * s) if t else (h // s, w // s)
        fin_g = self._final_groups(f)
        total += 2.0 * k * k * (in_c // fin_g) * frac * f * oh * ow
        # dense 1x1 aggregator (position does not change its cost order;
        # count it at the mid resolution/width it actually runs at)
        if self.agg == "pre":
            total += 2.0 * in_shape[-1] * in_shape[-1]                 * in_shape[1] * in_shape[2]
        elif self.agg.startswith("post"):
            i = int(self.agg[4:])
            sh, sw, c = in_shape[1], in_shape[2], in_shape[-1]
            sspecs = self._specs()[0]
            for features, g, kernel, stride, transpose in sspecs[:i + 1]:
                sh = sh * stride if transpose else sh // stride
                sw = sw * stride if transpose else sw // stride
                c = features
            total += 2.0 * c * c * sh * sw
        return float(total)
