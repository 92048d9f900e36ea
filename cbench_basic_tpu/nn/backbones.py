"""Slimmable Cheng2020 / ELIC backbone transforms (residual + attention).

Parity targets in the reference:
  * Cheng2020{,NoAttn}{Analysis,Synthesis}SlimmableConv2dPGMModel and the
    hyper heads (cbench/nn/layers/pgm_layers.py:1078-1165).
  * ELIC{,NoAttn}{Analysis,Synthesis}SlimmableConv2dPGMModel + hyper heads
    (pgm_layers.py:1168-1270).
  * The compressai-style Dynamic blocks they are assembled from
    (cbench/nn/layers/slimmable_layers.py:298-520): residual block
    (+stride/+subpel-upsample variants), He-style bottleneck block, and the
    Cheng2020 simplified attention block.

TPU-first realization (not a translation):
  * NHWC layouts; weights stored once at max width and sliced statically per
    complexity level — each level compiles to its own dense XLA program, so
    the MXU always sees static-shape convs.
  * Upsampling is conv + depth_to_space (sub-pixel) rather than
    conv_transpose: a dense stride-1 conv keeps the MXU tiling trivial and
    the shuffle is a free relayout for XLA.
  * Every block reports analytic FLOPs and output shape per level, so the
    PGMSlimmableEdge machinery (soft-mixture training / FLOPs losses,
    nn/slimmable.py) works unchanged on these backbones.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .slimmable import DEFAULT_WIDTHS, SlimmableConv, SlimmableGDN


def _cflops(k: int, in_c: int, out_c: int, h: int, w: int) -> float:
    return 2.0 * k * k * in_c * out_c * h * w


def _lvl(seq, level: int) -> int:
    """Clamp a complexity level to a stage's width list (fixed-width stages
    like the M-channel output conv have a single entry for every level)."""
    return min(level, len(seq) - 1)


class SlimmableSubpelConv(nn.Module):
    """3x3 sub-pixel upsampling conv: conv to c*r^2 then depth_to_space.

    Parity: dynamic_subpel_conv3x3 (slimmable_layers.py:305-313); realized
    as dense conv + relayout instead of transpose conv.
    """

    features_list: Sequence[int]
    max_in: int
    r: int = 2
    kernel: int = 3

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.features_list, level)
        out_c = self.features_list[level]
        r = self.r
        conv = SlimmableConv([c * r * r for c in self.features_list],
                             max_in=self.max_in, kernel=self.kernel, stride=1)
        y = conv(x, level)
        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, out_c, r, r)
        y = y.transpose(0, 1, 4, 2, 5, 3)
        return y.reshape(n, h * r, w * r, out_c)

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.features_list, level)
        h, w = in_shape[1], in_shape[2]
        return _cflops(self.kernel, in_shape[-1],
                       self.features_list[level] * self.r * self.r, h, w)

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        level = _lvl(self.features_list, level)
        return (in_shape[0], in_shape[1] * self.r, in_shape[2] * self.r,
                self.features_list[level])


class SlimmableResidualBlock(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu + skip.

    Parity: DynamicResidualBlock (slimmable_layers.py:384-414). The 1x1
    projection skip is a STATIC choice (project_skip) because whether
    in_c == out_c is knowable from the architecture, keeping the flax param
    tree identical across levels.
    """

    widths: Sequence[int]
    max_in: int
    project_skip: bool = False

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        out = nn.leaky_relu(SlimmableConv(
            self.widths, max_in=self.max_in, kernel=3, stride=1,
            name="conv1")(x, level))
        out = nn.leaky_relu(SlimmableConv(
            self.widths, max_in=max(self.widths), kernel=3, stride=1,
            name="conv2")(out, level))
        identity = x
        if self.project_skip:
            identity = SlimmableConv(self.widths, max_in=self.max_in,
                                     kernel=1, stride=1, name="skip")(x, level)
        return out + identity

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        h, w = in_shape[1], in_shape[2]
        c = self.widths[level]
        total = _cflops(3, in_shape[-1], c, h, w) + _cflops(3, c, c, h, w)
        if self.project_skip:
            total += _cflops(1, in_shape[-1], c, h, w)
        return total

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        level = _lvl(self.widths, level)
        return (in_shape[0], in_shape[1], in_shape[2], self.widths[level])


class SlimmableResidualBlockWithStride(nn.Module):
    """conv3x3/s -> lrelu -> conv3x3 -> GDN + strided 1x1 skip.

    Parity: DynamicResidualBlockWithStride (slimmable_layers.py:322-353).
    """

    widths: Sequence[int]
    max_in: int
    stride: int = 2

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        out = nn.leaky_relu(SlimmableConv(
            self.widths, max_in=self.max_in, kernel=3, stride=self.stride,
            name="conv1")(x, level))
        out = SlimmableConv(self.widths, max_in=max(self.widths), kernel=3,
                            stride=1, name="conv2")(out, level)
        out = SlimmableGDN(max(self.widths), name="gdn")(out)
        identity = SlimmableConv(self.widths, max_in=self.max_in, kernel=1,
                                 stride=self.stride, name="skip")(x, level)
        return out + identity

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        h, w = in_shape[1] // self.stride, in_shape[2] // self.stride
        c = self.widths[level]
        return (_cflops(3, in_shape[-1], c, h, w) + _cflops(3, c, c, h, w) +
                _cflops(1, in_shape[-1], c, h, w) + 2.0 * c * c * h * w)

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        level = _lvl(self.widths, level)
        return (in_shape[0], in_shape[1] // self.stride,
                in_shape[2] // self.stride, self.widths[level])


class SlimmableResidualBlockUpsample(nn.Module):
    """subpel -> lrelu -> conv3x3 -> IGDN + subpel skip.

    Parity: DynamicResidualBlockUpsample (slimmable_layers.py:356-381).
    """

    widths: Sequence[int]
    max_in: int
    r: int = 2

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        out = nn.leaky_relu(SlimmableSubpelConv(
            self.widths, max_in=self.max_in, r=self.r, name="subpel")(x, level))
        out = SlimmableConv(self.widths, max_in=max(self.widths), kernel=3,
                            stride=1, name="conv")(out, level)
        out = SlimmableGDN(max(self.widths), inverse=True, name="igdn")(out)
        identity = SlimmableSubpelConv(self.widths, max_in=self.max_in,
                                       r=self.r, name="upsample")(x, level)
        return out + identity

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        c = self.widths[level]
        h, w = in_shape[1], in_shape[2]
        hr, wr = h * self.r, w * self.r
        sub = _cflops(3, in_shape[-1], c * self.r * self.r, h, w)
        return 2 * sub + _cflops(3, c, c, hr, wr) + 2.0 * c * c * hr * wr

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        level = _lvl(self.widths, level)
        return (in_shape[0], in_shape[1] * self.r, in_shape[2] * self.r,
                self.widths[level])


class SlimmableResidualBottleneckBlock(nn.Module):
    """1x1 reduce -> relu -> 3x3 -> relu -> 1x1 restore + identity.

    Parity: DynamicResidualBottleneckBlock (slimmable_layers.py:417-454,
    He2016 bottleneck, mid = out // 2). ELIC's building unit.
    """

    widths: Sequence[int]
    max_in: int

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        mid = [c // 2 for c in self.widths]
        out = nn.relu(SlimmableConv(mid, max_in=self.max_in, kernel=1,
                                    stride=1, name="conv1")(x, level))
        out = nn.relu(SlimmableConv(mid, max_in=max(mid), kernel=3,
                                    stride=1, name="conv2")(out, level))
        out = SlimmableConv(self.widths, max_in=max(mid), kernel=1,
                            stride=1, name="conv3")(out, level)
        return out + x

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        h, w = in_shape[1], in_shape[2]
        c, m = self.widths[level], self.widths[level] // 2
        return (_cflops(1, in_shape[-1], m, h, w) + _cflops(3, m, m, h, w) +
                _cflops(1, m, c, h, w))

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        level = _lvl(self.widths, level)
        return (in_shape[0], in_shape[1], in_shape[2], self.widths[level])


class _SlimmableResidualUnit(nn.Module):
    """1x1 half -> relu -> 3x3 -> relu -> 1x1 full + identity, relu."""

    widths: Sequence[int]

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        half = [c // 2 for c in self.widths]
        out = nn.relu(SlimmableConv(half, max_in=max(self.widths), kernel=1,
                                    stride=1, name="conv1")(x, level))
        out = nn.relu(SlimmableConv(half, max_in=max(half), kernel=3,
                                    stride=1, name="conv2")(out, level))
        out = SlimmableConv(self.widths, max_in=max(half), kernel=1,
                            stride=1, name="conv3")(out, level)
        return nn.relu(out + x)

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        h, w = in_shape[1], in_shape[2]
        c, m = self.widths[level], self.widths[level] // 2
        return (_cflops(1, c, m, h, w) + _cflops(3, m, m, h, w) +
                _cflops(1, m, c, h, w))


class SlimmableAttentionBlock(nn.Module):
    """Cheng2020 simplified attention: x + trunk(x) * sigmoid(mask(x)).

    Parity: DynamicAttentionBlock (slimmable_layers.py:457-520,
    arXiv:2001.01568). Both branches are 3 residual units; the mask branch
    adds a final 1x1.
    """

    widths: Sequence[int]

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        a = x
        for i in range(3):
            a = _SlimmableResidualUnit(self.widths, name=f"a{i}")(a, level)
        b = x
        for i in range(3):
            b = _SlimmableResidualUnit(self.widths, name=f"b{i}")(b, level)
        b = SlimmableConv(self.widths, max_in=max(self.widths), kernel=1,
                          stride=1, name="b_out")(b, level)
        return x + a * nn.sigmoid(b)

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        h, w = in_shape[1], in_shape[2]
        c, m = self.widths[level], self.widths[level] // 2
        unit = (_cflops(1, c, m, h, w) + _cflops(3, m, m, h, w) +
                _cflops(1, m, c, h, w))
        return 6 * unit + _cflops(1, c, c, h, w)

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        return in_shape


class _SlimmableStack(nn.Module):
    """Base for transforms assembled from (name, block) stages.

    Subclasses define stages() -> list of blocks; __call__ threads
    (x, level) through them and flops()/out_shape() chain the blocks'
    analytic shape arithmetic, satisfying the PGMSlimmableEdge protocol.
    """

    @nn.nowrap
    def _blocks(self):
        raise NotImplementedError

    def setup(self):
        self.blocks = self._blocks()

    @nn.nowrap
    def _stack(self):
        """Bound modules reuse the setup-built blocks (constructing new
        submodules outside setup/compact is illegal); unbound config-level
        calls build a throwaway spec stack for the shape arithmetic."""
        if self.scope is not None:
            return self.blocks
        return self._blocks()

    def __call__(self, x, level: int = 0):
        for blk in self.blocks:
            x = blk(x, level)
        return x

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        total = 0.0
        for blk in self._stack():
            total += blk.flops(in_shape, level)
            in_shape = blk.out_shape(in_shape, level)
        return total

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        for blk in self._stack():
            in_shape = blk.out_shape(in_shape, level)
        return in_shape


class _SConvStage(nn.Module):
    """Plain slimmable conv stage with optional activation, as a block."""

    widths: Sequence[int]
    max_in: int
    kernel: int = 5
    stride: int = 2
    act: str = "none"
    r: int = 1  # r>1: subpel upsample instead of strided conv

    @nn.compact
    def __call__(self, x, level: int):
        level = _lvl(self.widths, level)
        if self.r > 1:
            y = SlimmableSubpelConv(self.widths, max_in=self.max_in,
                                    r=self.r, name="conv")(x, level)
        else:
            y = SlimmableConv(self.widths, max_in=self.max_in,
                              kernel=self.kernel, stride=self.stride,
                              name="conv")(x, level)
        if self.act == "relu":
            y = nn.relu(y)
        elif self.act == "lrelu":
            y = nn.leaky_relu(y)
        return y

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        if self.r > 1:
            return _cflops(self.kernel, in_shape[-1],
                           self.widths[level] * self.r * self.r,
                           in_shape[1], in_shape[2])
        h = in_shape[1] // self.stride
        w = in_shape[2] // self.stride
        return _cflops(self.kernel, in_shape[-1], self.widths[level], h, w)

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        level = _lvl(self.widths, level)
        if self.r > 1:
            return (in_shape[0], in_shape[1] * self.r, in_shape[2] * self.r,
                    self.widths[level])
        return (in_shape[0], in_shape[1] // self.stride,
                in_shape[2] // self.stride, self.widths[level])


class Cheng2020AnalysisTransform(_SlimmableStack):
    """g_a: residual/stride stack with optional attention.

    Parity: Cheng2020{,NoAttn}AnalysisSlimmableConv2dPGMModel
    (pgm_layers.py:1078-1120).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    in_channels: int = 3
    attn: bool = True

    @nn.nowrap
    def _blocks(self):
        w, m = self.widths, (self.M,)
        blocks = [
            SlimmableResidualBlockWithStride(w, max_in=self.in_channels,
),
            SlimmableResidualBlock(w, max_in=max(w)),
            SlimmableResidualBlockWithStride(w, max_in=max(w)),
        ]
        if self.attn:
            blocks.append(SlimmableAttentionBlock(w))
        blocks += [
            SlimmableResidualBlock(w, max_in=max(w)),
            SlimmableResidualBlockWithStride(w, max_in=max(w)),
            SlimmableResidualBlock(w, max_in=max(w)),
            _SConvStage(m, max_in=max(w), kernel=3, stride=2),
        ]
        if self.attn:
            blocks.append(SlimmableAttentionBlock(m))
        return blocks


class Cheng2020SynthesisTransform(_SlimmableStack):
    """g_s: attention + residual/upsample stack ending in subpel to RGB.

    Parity: Cheng2020{,NoAttn}SynthesisSlimmableConv2dPGMModel
    (pgm_layers.py:1093-1133).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    out_channels: int = 3
    attn: bool = True

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        blocks = []
        if self.attn:
            blocks.append(SlimmableAttentionBlock((self.M,)))
        blocks += [
            SlimmableResidualBlock(w, max_in=self.M, project_skip=True,
),
            SlimmableResidualBlockUpsample(w, max_in=max(w)),
            SlimmableResidualBlock(w, max_in=max(w)),
            SlimmableResidualBlockUpsample(w, max_in=max(w)),
        ]
        if self.attn:
            blocks.append(SlimmableAttentionBlock(w))
        blocks += [
            SlimmableResidualBlock(w, max_in=max(w)),
            SlimmableResidualBlockUpsample(w, max_in=max(w)),
            SlimmableResidualBlock(w, max_in=max(w)),
            _SConvStage((self.out_channels,), max_in=max(w), r=2),
        ]
        return blocks


class Cheng2020HyperAnalysisTransform(_SlimmableStack):
    """h_a: 3x3 conv stack, two stride-2 steps.

    Parity: Cheng2020HyperAnalysisSlimmableConv2dPGMModel
    (pgm_layers.py:1136-1148).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    M: int = 192

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        return [
            _SConvStage(w, max_in=self.M, kernel=3, stride=1, act="lrelu",
),
            _SConvStage(w, max_in=max(w), kernel=3, stride=1, act="lrelu",
),
            _SConvStage(w, max_in=max(w), kernel=3, stride=2, act="lrelu",
),
            _SConvStage(w, max_in=max(w), kernel=3, stride=1, act="lrelu",
),
            _SConvStage((self.N,), max_in=max(w), kernel=3, stride=2,
),
        ]


class Cheng2020HyperSynthesisTransform(_SlimmableStack):
    """h_s: conv/subpel stack widening 1.5x then to out_channels.

    Parity: Cheng2020HyperSynthesisSlimmableConv2dPGMModel
    (pgm_layers.py:1151-1165): l2 widths are 3/2 of mid widths and the
    output doubles max mid width.
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    out_channels: int = 384

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        l2 = [c * 3 // 2 for c in w]
        return [
            _SConvStage(w, max_in=self.N, kernel=3, stride=1, act="lrelu",
),
            _SConvStage(w, max_in=max(w), r=2, act="lrelu"),
            _SConvStage(l2, max_in=max(w), kernel=3, stride=1, act="lrelu",
),
            _SConvStage(l2, max_in=max(l2), r=2, act="lrelu"),
            _SConvStage((self.out_channels,), max_in=max(l2), kernel=3,
                        stride=1),
        ]


class ELICAnalysisTransform(_SlimmableStack):
    """g_a: 4 stride-2 convs with 3 bottleneck blocks between each.

    Parity: ELIC{,NoAttn}AnalysisSlimmableConv2dPGMModel
    (pgm_layers.py:1168-1224).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    in_channels: int = 3
    attn: bool = True

    @nn.nowrap
    def _blocks(self):
        w, m = self.widths, (self.M,)
        blocks = [_SConvStage(w, max_in=self.in_channels)]
        for g in range(3):
            for i in range(3):
                blocks.append(SlimmableResidualBottleneckBlock(
                    w, max_in=max(w)))
            if self.attn and g == 2:
                blocks.append(SlimmableAttentionBlock(w))
            out = m if g == 2 else w
            blocks.append(_SConvStage(out, max_in=max(w),
))
        if self.attn:
            blocks.append(SlimmableAttentionBlock(m))
        return blocks


class ELICSynthesisTransform(_SlimmableStack):
    """g_s: 4 subpel upsamples with 3 bottleneck blocks between each.

    Parity: ELIC{,NoAttn}SynthesisSlimmableConv2dPGMModel
    (pgm_layers.py:1187-1245); transpose convs become subpel stages.
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    out_channels: int = 3
    attn: bool = True

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        blocks = []
        if self.attn:
            blocks.append(SlimmableAttentionBlock((self.M,)))
        blocks.append(_SConvStage(w, max_in=self.M, r=2))
        for g in range(3):
            if self.attn and g == 1:
                blocks.append(SlimmableAttentionBlock(w))
            for i in range(3):
                blocks.append(SlimmableResidualBottleneckBlock(
                    w, max_in=max(w)))
            out = (self.out_channels,) if g == 2 else w
            blocks.append(_SConvStage(out, max_in=max(w), r=2,
))
        return blocks


class ELICHyperAnalysisTransform(_SlimmableStack):
    """h_a: 3x3 stride-1 then two stride-2 convs with relu.

    Parity: ELICHyperAnalysisSlimmableConv2dPGMModel
    (pgm_layers.py:1248-1256).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    M: int = 192

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        return [
            _SConvStage(w, max_in=self.M, kernel=3, stride=1, act="relu",
),
            _SConvStage(w, max_in=max(w), act="relu"),
            _SConvStage((self.N,), max_in=max(w)),
        ]


class ELICHyperSynthesisTransform(_SlimmableStack):
    """h_s: two subpel upsamples widening 1.5x then 3x3 to out_channels.

    Parity: ELICHyperSynthesisSlimmableConv2dPGMModel
    (pgm_layers.py:1259-1270).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    out_channels: int = 384

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        l2 = [c * 3 // 2 for c in w]
        return [
            _SConvStage(w, max_in=self.N, kernel=5, r=2, act="relu",
),
            _SConvStage(l2, max_in=max(w), kernel=5, r=2, act="relu",
),
            _SConvStage((self.out_channels,), max_in=max(l2), kernel=3,
                        stride=1),
        ]


class SlimmableDepthwiseConv(nn.Module):
    """Depthwise conv over a slimmable channel count (kernel sliced)."""

    widths: Sequence[int]
    kernel: int = 3

    @nn.compact
    def __call__(self, x, level: int):
        c = x.shape[-1]
        k = self.kernel
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, 1, max(self.widths)))
        bias = self.param("bias", nn.initializers.zeros, (max(self.widths),))
        import jax
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (k, k, 1, c), ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, kernel[..., :c], (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=c)
        return out + bias[:c]


class SpatialModulationAdaptor(nn.Module):
    """SMA: s_up(relu(dw5(s_down1(x)) * s_down2(x))).

    Parity: DynamicSpatialModulationAdaptor (slimmable_layers.py:777-791).
    """

    mid_widths: Sequence[int]
    out_widths: Sequence[int]

    @nn.compact
    def __call__(self, x, level: int):
        mlvl = _lvl(self.mid_widths, level)
        d1 = SlimmableConv(self.mid_widths, max_in=max(self.out_widths),
                           kernel=1, stride=1, name="s_down1")(x, mlvl)
        d2 = SlimmableConv(self.mid_widths, max_in=max(self.out_widths),
                           kernel=1, stride=1, name="s_down2")(x, mlvl)
        g = nn.relu(SlimmableDepthwiseConv(self.mid_widths, kernel=5,
                                           name="s_dw")(d1, mlvl) * d2)
        return SlimmableConv(self.out_widths, max_in=max(self.mid_widths),
                             kernel=1, stride=1, name="s_up")(
            g, _lvl(self.out_widths, level))


class FrequencyModulationAdaptor(nn.Module):
    """FMA: modulate the rfft2 amplitude with a small gated conv stack.

    Parity: DynamicFrequencyModulationAdaptor (slimmable_layers.py:794-828).
    TPU note: 2-D real FFTs lower to XLA's fft op; amplitude/phase are
    reconstructed with the numerically-stable atan2 guard the reference
    uses.
    """

    mid_widths: Sequence[int]
    out_widths: Sequence[int]

    @nn.compact
    def __call__(self, x, level: int):
        mlvl = _lvl(self.mid_widths, level)
        y0 = SlimmableConv(self.mid_widths, max_in=max(self.out_widths),
                           kernel=1, stride=1, name="f_down")(x, mlvl)
        y = jnp.fft.rfft2(y0, axes=(1, 2))
        amp = jnp.abs(y)
        re = jnp.where(y.real >= 0, y.real + 1e-10, y.real - 1e-10)
        phs = jnp.arctan2(y.imag, re)
        mod = SlimmableConv(self.mid_widths, max_in=max(self.mid_widths),
                            kernel=1, stride=1, name="f_inter")(
            nn.relu(SlimmableDepthwiseConv(self.mid_widths, kernel=3,
                                           name="f_dw")(amp, mlvl)), mlvl)
        amp = amp * nn.sigmoid(mod)
        y = amp * jnp.cos(phs) + 1j * amp * jnp.sin(phs)
        y = jnp.fft.irfft2(y, s=x.shape[1:3], axes=(1, 2))
        return SlimmableConv(self.out_widths, max_in=max(self.mid_widths),
                             kernel=1, stride=1, name="f_up")(
            nn.relu(y), _lvl(self.out_widths, level))


class SFMAAdaptor(nn.Module):
    """Spatial-frequency modulation adaptor bank: idx 0 = identity, idx k
    applies modulator k-1 as x + (fma(x) + sma(x)) * factor.

    Parity: GroupedDynamicSpatialFrequencyModulationAdaptor
    (slimmable_layers.py:851-869). idx is STATIC (one XLA program per
    modulator choice), matching the sfma_idx dynamic-parameter semantics.
    """

    widths: Sequence[int]
    mid_widths: Sequence[int] = (16, 32, 64)
    num_modulators: int = 1
    factor: float = 1.0

    @nn.compact
    def __call__(self, x, level: int, sfma_idx: int = 0):
        # Every modulator is traced so its params exist for any idx
        # (checkpoint compatibility); inactive modulators' outputs are
        # unused and XLA dead-code-eliminates them after jit.
        outs = x
        for k in range(self.num_modulators):
            fma = FrequencyModulationAdaptor(self.mid_widths, self.widths,
                                             name=f"fma{k}")
            sma = SpatialModulationAdaptor(self.mid_widths, self.widths,
                                           name=f"sma{k}")
            mod = (fma(x, level) + sma(x, level)) * self.factor
            if sfma_idx > 0 and k == sfma_idx - 1:
                outs = x + mod
        return outs


class SFMAHyperpriorAnalysisTransform(nn.Module):
    """g_a with an SFMA adaptor after every GDN stage (variable-rate
    adaptation of a frozen backbone).

    Parity: SFMAHyperpriorAnalysisSlimmableConv2dPGMModel
    (pgm_layers.py:984-1016); sfma_idx selects the modulator (0 = off).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    in_channels: int = 3
    sfma_mid_widths: Sequence[int] = (16, 32, 64)
    num_modulators: int = 1
    sfma_idx: int = 0

    @nn.compact
    def __call__(self, x, level: int = 0, sfma_idx: int = None):
        idx = self.sfma_idx if sfma_idx is None else sfma_idx
        level = _lvl(self.widths, level)
        mw = max(self.widths)
        in_c = self.in_channels
        for i in range(3):
            x = SlimmableConv(self.widths, max_in=in_c,
                              name=f"conv{i + 1}")(x, level)
            x = SlimmableGDN(mw, name=f"gdn{i + 1}")(x)
            x = SFMAAdaptor(self.widths, self.sfma_mid_widths,
                            self.num_modulators,
                            name=f"sfma{i + 1}")(x, level, idx)
            in_c = mw
        return SlimmableConv((self.M,), max_in=mw, name="conv4")(x, 0)

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        wl = self.widths[level]
        h, w, in_c = in_shape[1], in_shape[2], in_shape[-1]
        total = 0.0
        for _ in range(3):
            h, w = h // 2, w // 2
            total += _cflops(5, in_c, wl, h, w)
            in_c = wl
        return total + _cflops(5, in_c, self.M, h // 2, w // 2)

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        return (in_shape[0], in_shape[1] // 16, in_shape[2] // 16, self.M)


class SFMAHyperpriorSynthesisTransform(nn.Module):
    """g_s with an SFMA adaptor before every IGDN stage.

    Parity: SFMAHyperpriorSynthesisSlimmableConv2dPGMModel
    (pgm_layers.py:1019-1053); upsampling realized as subpel stages.
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    M: int = 192
    out_channels: int = 3
    sfma_mid_widths: Sequence[int] = (16, 32, 64)
    num_modulators: int = 1
    sfma_idx: int = 0

    @nn.compact
    def __call__(self, x, level: int = 0, sfma_idx: int = None):
        idx = self.sfma_idx if sfma_idx is None else sfma_idx
        level = _lvl(self.widths, level)
        mw = max(self.widths)
        in_c = self.M
        for i in range(3):
            x = SlimmableSubpelConv(self.widths, max_in=in_c,
                                    name=f"up{i + 1}")(x, level)
            x = SFMAAdaptor(self.widths, self.sfma_mid_widths,
                            self.num_modulators,
                            name=f"sfma{i + 1}")(x, level, idx)
            x = SlimmableGDN(mw, inverse=True, name=f"igdn{i + 1}")(x)
            in_c = mw
        return SlimmableSubpelConv((self.out_channels,), max_in=mw,
                                   name="up4")(x, 0)

    @nn.nowrap
    def flops(self, in_shape, level: int) -> float:
        level = _lvl(self.widths, level)
        wl = self.widths[level]
        h, w, in_c = in_shape[1], in_shape[2], in_shape[-1]
        total = 0.0
        for _ in range(3):
            total += _cflops(3, in_c, wl * 4, h, w)
            h, w, in_c = h * 2, w * 2, wl
        return total + _cflops(3, in_c, self.out_channels * 4, h, w)

    @nn.nowrap
    def out_shape(self, in_shape, level: int):
        return (in_shape[0], in_shape[1] * 16, in_shape[2] * 16,
                self.out_channels)


class MeanScaleSlimmableHyperSynthesisTransform(_SlimmableStack):
    """Mean-scale h_s: two subpel upsamples widening 1.5x, 3x3 head to 2M.

    Parity: MeanScaleHyperpriorHyperSynthesisSlimmableConv2dPGMModel
    (pgm_layers.py:1065-1076).
    """

    widths: Sequence[int] = DEFAULT_WIDTHS
    N: int = 192
    out_channels: int = 384

    @nn.nowrap
    def _blocks(self):
        w = self.widths
        l2 = [c * 3 // 2 for c in w]
        return [
            _SConvStage(w, max_in=self.N, r=2, act="lrelu"),
            _SConvStage(l2, max_in=max(w), r=2, act="lrelu"),
            _SConvStage((self.out_channels,), max_in=max(l2), kernel=3,
                        stride=1),
        ]
