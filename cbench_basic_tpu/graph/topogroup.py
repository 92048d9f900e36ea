"""Topogroup (intra-node BayesNet) autoregressive Gaussian coder.

Parity targets in the reference:
  * TopoGroupPGMPriorCoder group-mask encode/decode loops
    (pgm_coder.py:866-981): latent elements are partitioned into topological
    groups; all elements of a group are conditionally independent given
    earlier groups, so coding = num_groups full-tensor context evaluations
    instead of an H·W raster scan.
  * Fixed default patterns scanline / checkerboard / raster2x2 /
    channelwise / ELIC-10 (pgm_coder.py:1123-1168).
  * TopoGroupDynamicMaskConv2d (masked_conv.py:69-228): context conv where a
    neighbor is visible iff its topogroup id is strictly smaller.
  * Param merger combining context features with the hyperprior prior into
    per-element (scale, mean) (pgm_coder.py:1830-1960).

TPU-first realization: instead of unfold + per-position mask matmuls, the
causal context is computed as (a) a single weight-masked conv when the
pattern's causality is translation-invariant (scanline), or (b) a sum of G
full convs over group-masked inputs (checkerboard/raster/ELIC, G<=10) —
each pass is a dense MXU conv that XLA pipelines; decode runs the same
group step jit-compiled once (group id is a traced scalar) inside a short
host loop interleaved with rANS decode_stream calls.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.entropy_models import GaussianConditional

PATTERNS = ("checkerboard", "scanline", "raster", "raster2x2", "channelwise",
            "elic", "custom", "interlace-checkerboard",
            "channelwise-checkerboard", "channelwise-scanline", "zigzag",
            "half-checkerboard", "halfinv-checkerboard",
            "quarter-checkerboard", "random", "channelwise-random")


def topo_group_map(pattern: str, h: int, w: int, channels: int,
                   num_channel_groups: int = 1,
                   custom_block=None,
                   channel_splits=None,
                   num_topo_groups: int = 0) -> Tuple[jnp.ndarray, int]:
    """Build the per-element topogroup id map, shape (h, w, channels).

    Returns (gmap int32, num_groups). Pure jnp on static shapes (jittable).
    pattern="custom": custom_block is a (bh, bw) int grid of group ids,
    tiled spatially (the output of the GA pattern search, graph/ga_search.py).
    channel_splits: optional merge of the uniform channel groups into
    super-groups, in channel-group units — e.g. the reference's ELIC split
    (1, 1, 2, 4, rest) over 16-channel groups (pgm_coder.py:1478-1492).
    Patterns cover the reference's default_topo_group_method table
    (pgm_coder.py:1425-1492).
    """
    n_cg = num_channel_groups
    split_assign = None
    if channel_splits is not None:
        splits = [int(s) for s in channel_splits]
        if sum(splits) != num_channel_groups:
            raise ValueError("channel_splits must sum to num_channel_groups")
        split_assign = np.repeat(np.arange(len(splits)), splits)
        n_cg = len(splits)

    if pattern in ("random", "channelwise-random"):
        # Reference default_topo_group_method "random"/"channelwise-random"
        # (pgm_coder.py:1421-1429): uniform random group per element — the
        # serial-order baseline for the 2-stage `-random` experiments.
        # Deterministic seed so encoder and decoder agree on the map.
        rng = np.random.default_rng(0xBA51C)
        cg_np = np.minimum(np.arange(channels)
                           // max(1, channels // max(1, num_channel_groups)),
                           num_channel_groups - 1)
        if split_assign is not None:
            cg_np = split_assign[cg_np]
            n_cg_eff = len(set(split_assign.tolist()))
        else:
            n_cg_eff = n_cg
        if pattern == "random":
            num = num_topo_groups if num_topo_groups > 1 else n_cg_eff * h * w
            gmap = rng.integers(0, num, (h, w, channels))
        else:
            sp = (num_topo_groups // n_cg_eff if num_topo_groups > 1
                  else h * w)
            sp = max(1, sp)
            gmap = (rng.integers(0, sp, (h, w, channels))
                    + cg_np[None, None, :] * sp)
            num = sp * n_cg_eff
        return jnp.asarray(gmap, jnp.int32), int(num)
    if pattern == "custom":
        block = np.asarray(custom_block, np.int32)
        bh, bw = block.shape
        reps = (-(-h // bh), -(-w // bw))
        g2d = np.tile(block, reps)[:h, :w]
        num = int(block.max()) + 1
        cg = np.minimum(np.arange(channels)
                        // max(1, channels // max(1, num_channel_groups)),
                        num_channel_groups - 1)
        if split_assign is not None:
            cg = split_assign[cg]
        gmap = num * cg[None, None, :] + g2d[..., None]
        return jnp.asarray(gmap, jnp.int32), num * n_cg
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    chan = jax.lax.broadcasted_iota(jnp.int32, (h, w, channels), 2)
    cg = chan // max(1, channels // max(1, num_channel_groups))
    cg = jnp.minimum(cg, num_channel_groups - 1)
    if split_assign is not None:
        cg = jnp.asarray(split_assign, jnp.int32)[cg]

    if pattern == "checkerboard":
        g2d = (rows + cols) % 2
        gmap, num = g2d[..., None] + 0 * chan, 2
    elif pattern == "half-checkerboard":
        # only the odd/odd quarter decodes first (ref pgm_coder.py:1443-1445)
        g2d = 1 - ((rows % 2) * (cols % 2))
        gmap, num = g2d[..., None] + 0 * chan, 2
    elif pattern == "halfinv-checkerboard":
        g2d = (rows % 2) * (cols % 2)
        gmap, num = g2d[..., None] + 0 * chan, 2
    elif pattern == "quarter-checkerboard":
        g2d = 1 - ((rows % 4 == 1) & (cols % 4 == 3)).astype(jnp.int32) \
            - ((rows % 4 == 3) & (cols % 4 == 1)).astype(jnp.int32)
        gmap, num = g2d[..., None] + 0 * chan, 2
    elif pattern == "interlace-checkerboard":
        # checkerboard with the phase flipped on alternate channel groups
        # (ref pgm_coder.py:1451-1458): still 2 groups total.
        g2d = (rows + cols) % 2
        gmap, num = (g2d[..., None] + cg) % 2, 2
    elif pattern == "scanline":
        gmap, num = rows[..., None] + 0 * chan, h
    elif pattern == "zigzag":
        g2d = rows + cols
        gmap, num = g2d[..., None] + 0 * chan, h + w - 1
    elif pattern == "raster":
        # Full per-pixel serial AR (the Minnen joint-AR baseline the
        # topogroup design replaces — reference pgm_coder.py:1975-2060):
        # every spatial position is its own group, H*W decode steps.
        g2d = rows * w + cols
        gmap, num = g2d[..., None] + 0 * chan, h * w
    elif pattern == "raster2x2":
        g2d = 2 * (rows % 2) + (cols % 2)
        gmap, num = g2d[..., None] + 0 * chan, 4
    elif pattern == "channelwise":
        gmap, num = cg, n_cg
    elif pattern == "channelwise-scanline":
        # per-channel-group full raster, offset per group (ref :1466-1471)
        g2d = rows * w + cols
        gmap, num = g2d[..., None] + cg * (h * w), n_cg * h * w
    elif pattern in ("elic", "channelwise-checkerboard"):
        # channel groups x checkerboard; "elic" composes with the
        # (1, 1, 2, 4, rest) channel_splits for the published layout
        g2d = (rows + cols) % 2
        gmap, num = 2 * cg + g2d[..., None], 2 * n_cg
    else:
        raise ValueError(f"unknown topogroup pattern {pattern!r}")
    return gmap.astype(jnp.int32), num


def _merged_channel_ranges(channels: int, num_channel_groups: int,
                           channel_splits):
    """Contiguous (c0, c1) per (possibly split-merged) channel group,
    mirroring topo_group_map's cg construction exactly."""
    cg = np.minimum(np.arange(channels)
                    // max(1, channels // max(1, num_channel_groups)),
                    num_channel_groups - 1)
    if channel_splits is not None:
        splits = [int(s) for s in channel_splits]
        cg = np.repeat(np.arange(len(splits)), splits)[cg]
    ranges = []
    for g in range(int(cg.max()) + 1):
        idx = np.nonzero(cg == g)[0]
        ranges.append((int(idx[0]), int(idx[-1]) + 1))
    return ranges


def topo_group_slice_runs(pattern: str, h: int, w: int, channels: int,
                          num_channel_groups: int = 1,
                          channel_splits=None):
    """Slice-run decomposition of a fixed topogroup pattern: per group, a
    list of (phase_h, phase_w, c0, c1) 2x2-sublattice x channel-range
    products whose union IS the group. Returns None when the pattern is
    not 2x2-product-decomposable (scanline/zigzag/raster/random/custom/
    learned) or the spatial dims are odd.

    Why: TPU lowers position gathers/scatters to a ~29 M elem/s serial
    unit (tools/probe_decode_gather.py), so the fused coding passes paid
    ~3 serial accesses per symbol to marshal group elements. A product
    run is a strided slice — memory-bandwidth speed — so every pattern
    the published configs use (elic/checkerboard/channelwise families)
    codes with ZERO per-element marshalling (see
    decode_all_groups_device / collect_stream_symbols)."""
    if h % 2 or w % 2:
        return None
    C = channels
    if pattern == "checkerboard":
        return [[(0, p, 0, C), (1, 1 - p, 0, C)] for p in (0, 1)]
    if pattern == "raster2x2":
        return [[(g >> 1, g & 1, 0, C)] for g in range(4)]
    ranges = _merged_channel_ranges(C, num_channel_groups, channel_splits)
    if pattern in ("elic", "channelwise-checkerboard"):
        runs = []
        for c0, c1 in ranges:
            for p in (0, 1):
                runs.append([(0, p, c0, c1), (1, 1 - p, c0, c1)])
        return runs
    if pattern == "channelwise":
        return [[(ph, pw, c0, c1) for ph in (0, 1) for pw in (0, 1)]
                for c0, c1 in ranges]
    if pattern == "interlace-checkerboard":
        runs = [[], []]
        for cg, (c0, c1) in enumerate(ranges):
            for g in (0, 1):
                p = (g + cg) % 2
                runs[g] += [(0, p, c0, c1), (1, 1 - p, c0, c1)]
        return runs
    if pattern == "half-checkerboard":
        return [[(1, 1, 0, C)],
                [(0, 0, 0, C), (0, 1, 0, C), (1, 0, 0, C)]]
    if pattern == "halfinv-checkerboard":
        return [[(0, 0, 0, C), (0, 1, 0, C), (1, 0, 0, C)],
                [(1, 1, 0, C)]]
    return None


def space_to_depth2(a: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), phase-major column layout
    (column = (2*ph + pw) * C + c)."""
    n, h, w, c = a.shape
    return a.reshape(n, h // 2, 2, w // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space2(a: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Inverse of space_to_depth2."""
    n, h2, w2, _ = a.shape
    return a.reshape(n, h2, w2, 2, 2, channels) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h2, 2 * w2, channels)


_SLICE_LAYOUT = os.environ.get("CBT_SLICE_LAYOUT", "1") != "0"


class ChannelCausalConv3D(nn.Module):
    """3D conv over (channel-group, H, W) reading STRICTLY-EARLIER channel
    groups only (negative trailing pad on the group axis), full SAME padding
    spatially. The single-pass context for channelwise topogroups — the
    TPU re-architecture of the reference's TopoGroupDynamicMaskConv3d
    unfold kernel (pgm_coder.py:2481, masked_conv.py)."""

    features: int
    kz: int = 2   # how many earlier channel groups are visible
    kh: int = 3
    kw: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (N, CG, H, W, Cper) -> (N, CG, H, W, features)."""
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kz, self.kh, self.kw, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        # group axis: pad (kz, -1) so output group g reads g-kz .. g-1 only.
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1),
            padding=((self.kz, -1), (self.kh // 2, self.kh // 2),
                     (self.kw // 2, self.kw // 2)),
            dimension_numbers=dn)
        return out + b


class MaskedKernelConv(nn.Module):
    """Conv2d with a fixed boolean mask over kernel taps (NHWC)."""

    features: int
    kernel: int
    mask: np.ndarray  # (K, K) float/bool, 1 = visible tap

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = jnp.asarray(self.mask, w.dtype).reshape(k, k, 1, 1)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, w * mask, (1, 1), "SAME", dimension_numbers=dn)
        return out + b


class TopoGroupGaussianCoder(nn.Module):
    """Gaussian y-coder with topogroup-causal context + prior merger."""

    channels: int
    pattern: str = "checkerboard"
    num_channel_groups: int = 1
    context_channels: int = 384
    kernel: int = 5
    prior_channels: Optional[int] = None  # defaults to 2*channels
    # Learned intra-node BayesNet (pattern="learned"): a conv predictor maps
    # the PRIOR (decoder-available) to per-position topogroup logits.
    # Parity: the ResNet2d topo_group_predictor + MC-sampled discrete PGM
    # training (pgm_coder.py:1498-1604, param_generator.py:587); this
    # realization trains through a softmax relaxation (straight-through at
    # eval) instead of REINFORCE/VIMCO.
    num_topo_groups: int = 6
    topo_temperature: float = 1.0
    # Estimator for the discrete learned assignment (pattern="learned"):
    #   "relaxation" — softmax relaxation (biased, cheap; round-1 behavior);
    #   "reinforce"/"vimco"/"thermo" — the reference's MC-sampled
    #     score-function estimators (pgm_coder.py:70-135, 370-539): K hard
    #     samples per image, multi-sample rate objective, leave-one-out
    #     control variate (VIMCO) or TVO partitions (thermo). Unbiased
    #     w.r.t. the true discrete coding rate.
    learned_estimator: str = "relaxation"
    mc_samples: int = 4
    mc_loss_weight: float = 1.0
    # Context backbone:
    #   "conv"       — dense (masked) conv context (default; round-1 design)
    #   "attention"  — EntroFormer-style transformer context with topogroup-
    #                  causal key masking + 2D relative-position bias
    #                  (parity: GaussianEntroFormerPriorCoder,
    #                  pgm_coder.py:3217-3282)
    #   "maskconv3d" — single-pass channel-causal 3D conv for the channelwise
    #                  pattern (parity: TopoGroupDynamicMaskConv3d,
    #                  pgm_coder.py:2481)
    context_type: str = "conv"
    attn_depth: int = 2
    attn_heads: int = 6
    attn_dim_embed: int = 192
    attn_window: int = 0
    ctx3d_visible_groups: int = 2
    # pattern="custom": a (bh, bw) tuple-of-tuples block of group ids tiled
    # spatially — typically the GA pattern search result (graph/ga_search.py).
    custom_block: Optional[tuple] = None
    # channel_splits: merge the uniform channel groups into super-groups
    # (channel-group units; the reference ELIC split is (1, 1, 2, 4, rest),
    # pgm_coder.py:1484-1492). None = uniform groups.
    channel_splits: Optional[tuple] = None
    # Dynamic per-image context kernels (parity: the reference's
    # TopoGroupDynamicMaskConv2d dynamic kernels, masked_conv.py:69-228):
    # a hypernetwork maps the pooled PRIOR (decoder-available) to a
    # per-image depthwise kxk kernel whose response adds to the static
    # context. Group-masked patterns only (the zero-input visibility
    # masking carries the causality; scanline/raster weight-masking would
    # not cover the dynamic taps).
    dynamic_kernel: bool = False
    dynamic_kernel_hidden: int = 64
    # Gain-vector variable rate (parity: AutoEncoderPriorModel v2's
    # per-vrlevel gain / inverse-gain channel vectors,
    # prior_model/autoencoder_v2.py:26-737): the whole coder — context,
    # likelihood, coding — operates on the GAINED latent y·g[vrlevel];
    # the synthesis edge receives y_hat·ginv[vrlevel]. Fractional vrlevels
    # interpolate geometrically between adjacent gain vectors (the
    # continuous-rate trick of Cui et al.).
    num_rate_levels: int = 1

    def setup(self):
        self.gaussian = GaussianConditional()
        if self.num_rate_levels > 1:
            # level 0 = lowest rate; init spreads gains log-linearly so the
            # rate axis is born useful and training refines it.
            init_spread = np.exp(np.linspace(
                -0.5, 0.5, self.num_rate_levels))[:, None] * np.ones(
                (1, self.channels))
            self.rate_gains = self.param(
                "rate_gains", lambda *_: jnp.asarray(init_spread, jnp.float32),
                (self.num_rate_levels, self.channels))
            self.rate_inv_gains = self.param(
                "rate_inv_gains",
                lambda *_: jnp.asarray(1.0 / init_spread, jnp.float32),
                (self.num_rate_levels, self.channels))
        if self.context_type == "attention":
            if self.pattern in ("scanline", "raster"):
                raise ValueError(
                    "attention context uses the grouped path; scanline/"
                    "raster patterns keep the masked-conv context")
            from ..nn.attention import EntroFormerContext
            self.ctx_attn = EntroFormerContext(
                out_channels=self.context_channels,
                dim_embed=self.attn_dim_embed, depth=self.attn_depth,
                heads=self.attn_heads, window=self.attn_window)
        elif self.context_type == "maskconv3d":
            if self.pattern != "channelwise":
                raise ValueError("maskconv3d context requires the "
                                 "channelwise pattern")
            self.ctx_conv3d = ChannelCausalConv3D(
                self.context_channels, kz=self.ctx3d_visible_groups,
                kh=self.kernel, kw=self.kernel)
        elif self.context_type != "conv":
            raise ValueError(f"unknown context_type {self.context_type!r}")
        if self.dynamic_kernel:
            if self.pattern in ("scanline", "raster"):
                raise ValueError("dynamic_kernel needs a group-masked "
                                 "pattern (zero-input causality)")
            self.kernel_net = nn.Sequential([
                nn.Dense(self.dynamic_kernel_hidden), nn.leaky_relu,
                nn.Dense(self.kernel * self.kernel * self.channels,
                         kernel_init=nn.initializers.normal(0.02)),
            ])
            # only the projection is zero-init: the dynamic path starts as
            # a no-op but still receives gradient through dyn_proj.
            self.dyn_proj = nn.Dense(self.context_channels,
                                     kernel_init=nn.initializers.zeros)
        if self.pattern == "learned":
            self.predictor = nn.Sequential([
                nn.Conv(self.context_channels, (3, 3), padding="SAME"),
                nn.leaky_relu,
                nn.Conv(self.context_channels, (3, 3), padding="SAME"),
                nn.leaky_relu,
                nn.Conv(self.num_topo_groups * self.num_channel_groups, (1, 1)),
            ])
        if self.context_type != "conv":
            pass  # ctx_attn / ctx_conv3d built above
        elif self.pattern == "scanline":
            # Translation-invariant causality: strictly-earlier rows visible.
            k = self.kernel
            mask = np.zeros((k, k), np.float32)
            mask[: k // 2, :] = 1.0
            self.ctx_conv = MaskedKernelConv(self.context_channels, k, mask)
        elif self.pattern == "raster":
            # PixelCNN 'A' mask: earlier rows + left neighbors in the row.
            k = self.kernel
            mask = np.zeros((k, k), np.float32)
            mask[: k // 2, :] = 1.0
            mask[k // 2, : k // 2] = 1.0
            self.ctx_conv = MaskedKernelConv(self.context_channels, k, mask)
        else:
            self.ctx_conv = nn.Conv(self.context_channels,
                                    (self.kernel, self.kernel), padding="SAME")
        m = self.channels
        self.merger = nn.Sequential([
            nn.Conv(4 * m, (1, 1)), nn.leaky_relu,
            nn.Conv(3 * m, (1, 1)), nn.leaky_relu,
            nn.Conv(2 * m, (1, 1)),
        ])

    # -- gain-vector variable rate ---------------------------------------------
    def _gain(self, vrlevel):
        """(gain, inv_gain) channel vectors for a (possibly fractional,
        possibly traced) vrlevel; (1, 1) when the rate axis is off."""
        if self.num_rate_levels <= 1 or vrlevel is None:
            return None, None
        lv = jnp.clip(jnp.asarray(vrlevel, jnp.float32), 0.0,
                      self.num_rate_levels - 1.0)
        l0 = jnp.floor(lv).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, self.num_rate_levels - 1)
        t = (lv - l0.astype(jnp.float32))[..., None]
        g = jnp.exp((1.0 - t) * jnp.log(jnp.abs(self.rate_gains[l0]) + 1e-9)
                    + t * jnp.log(jnp.abs(self.rate_gains[l1]) + 1e-9))
        gi = jnp.exp((1.0 - t) * jnp.log(jnp.abs(self.rate_inv_gains[l0]) + 1e-9)
                     + t * jnp.log(jnp.abs(self.rate_inv_gains[l1]) + 1e-9))
        return g, gi

    def _apply_gain(self, value, g):
        return value if g is None else value * g

    # -- pieces ---------------------------------------------------------------
    def _gmap(self, shape):
        _, h, w, c = shape
        return topo_group_map(self.pattern, h, w, c,
                              self.num_channel_groups, self.custom_block,
                              self.channel_splits,
                              num_topo_groups=self.num_topo_groups)

    def _context(self, y_visible, key_mask=None, prior=None):
        if self.context_type == "attention":
            ctx = self.ctx_attn(y_visible, key_mask)
        else:
            ctx = self.ctx_conv(y_visible)
        if self.dynamic_kernel and prior is not None:
            ctx = ctx + self._dynamic_ctx(y_visible, prior)
        return ctx

    def _dynamic_ctx(self, vis, prior):
        """Per-image depthwise context from hypernetwork-predicted kernels
        (zero-initialized: the dynamic path grows from nothing)."""
        k, c = self.kernel, self.channels
        pooled = jnp.mean(prior, axis=(1, 2))                 # (N, P)
        kern = self.kernel_net(pooled).reshape(-1, k, k, 1, c)

        def one(img, kw):
            dn = jax.lax.conv_dimension_numbers(
                img[None].shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                img[None], kw, (1, 1), "SAME", feature_group_count=c,
                dimension_numbers=dn)[0]

        out = jax.vmap(one)(vis, kern)                        # (N, H, W, C)
        return self.dyn_proj(out)

    def _key_mask(self, gmap, g, y_visible):
        """Per-position attention key validity: any channel already coded."""
        if self.context_type != "attention":
            return None
        km = jnp.min(gmap, axis=-1) < g
        return jnp.broadcast_to(km, y_visible.shape[:-1])

    def _ctx3d(self, y_q):
        """Single-pass channel-causal context: (N,H,W,CG,ctx_channels)."""
        n, h, w, c = y_q.shape
        cg = self.num_channel_groups
        x = jnp.moveaxis(y_q.reshape(n, h, w, cg, c // cg), 3, 1)
        return jnp.moveaxis(self.ctx_conv3d(x), 1, 3)

    def _params(self, prior, ctx):
        scales, means = jnp.split(self.merger(jnp.concatenate([prior, ctx], -1)),
                                  2, axis=-1)
        return scales, means

    def _causal_context(self, y_q, gmap, num_groups):
        """Full causal context in one pass (weight-maskable patterns) or G
        masked passes."""
        if self.pattern in ("scanline", "raster"):
            return self._context(y_q)
        ctx = jnp.zeros(y_q.shape[:-1] + (self.context_channels,), y_q.dtype)
        for g in range(num_groups):
            vis = jnp.where(gmap < g, y_q, 0.0)
            ctx_g = self._context(vis, self._key_mask(gmap, g, y_q))
            ctx = jnp.where(gmap[..., :1] == g, ctx_g, ctx)
        return ctx

    def _grouped_params(self, y_q, prior, gmap, num_groups):
        """Per-element (scales, means) matching coding-time semantics
        EXACTLY: for each group g, context from strictly-earlier elements +
        merger, selected per element by its own group id. Unlike a shared
        per-position context, this stays correct when channels at one
        position belong to different groups (channelwise/elic/learned
        multi-channel-group patterns — the reference realizes this per
        element via the unfold-masked conv, masked_conv.py:69-228)."""
        m = self.channels
        params = jnp.zeros(y_q.shape[:-1] + (2 * m,), y_q.dtype)
        ctx3d = (self._ctx3d(y_q)
                 if self.context_type == "maskconv3d" else None)
        for g in range(num_groups):
            if ctx3d is not None:
                ctx_g = ctx3d[..., g, :]
            else:
                vis = jnp.where(gmap < g, y_q, 0.0)
                ctx_g = self._context(vis, self._key_mask(gmap, g, y_q),
                                      prior)
            p_g = self.merger(jnp.concatenate([prior, ctx_g], -1))
            sel = gmap == g
            params = jnp.where(jnp.concatenate([sel, sel], -1), p_g, params)
        return jnp.split(params, 2, axis=-1)

    def _channel_group_index(self, channels: int) -> jnp.ndarray:
        """Static channel -> channel-group index (topo_group_map convention)."""
        cg = np.arange(channels) // max(1, channels // max(1, self.num_channel_groups))
        return jnp.asarray(np.minimum(cg, self.num_channel_groups - 1), jnp.int32)

    def _expand_channel_groups(self, gmap_cg):
        """(..., CG) per-channel-group ids -> (..., channels) per-channel."""
        idx = self._channel_group_index(self.channels)
        return jnp.take(gmap_cg, idx, axis=-1)

    # -- training forward -------------------------------------------------------
    def __call__(self, value, prior=None, training: bool = True,
                 rng: Optional[jax.Array] = None, temperature=None,
                 vrlevel=None):
        if prior is None:
            raise ValueError("topogroup coder needs a hyperprior prior")
        g, gi = self._gain(vrlevel)
        value = self._apply_gain(value, g)
        if training:
            if rng is None:
                raise ValueError("training forward needs rng")
            rng, mc_rng = jax.random.split(rng)
            y_q = value + jax.random.uniform(rng, value.shape, minval=-0.5, maxval=0.5)
        else:
            mc_rng = None
            y_q = value + jax.lax.stop_gradient(jnp.round(value) - value)
        if self.pattern == "learned":
            if training and self.learned_estimator in ("reinforce", "vimco",
                                                       "thermo"):
                out = self._mc_learned_forward(y_q, prior, mc_rng, temperature)
                out["value_hat"] = self._apply_gain(out["value_hat"], gi)
                return out
            if training and self.learned_estimator == "relaxation":
                if self.num_channel_groups > 1:
                    scales, means = self._learned_relaxed_params_cg(
                        y_q, prior, temperature=temperature)
                else:
                    ctx = self._learned_causal_context(
                        y_q, prior, training, temperature=temperature)
                    scales, means = self._params(prior, ctx)
            else:
                # Eval: hard argmax map + coding-exact grouped params.
                gmap = self.topo_map_from_prior(prior)
                scales, means = self._grouped_params(
                    y_q, prior, gmap, self.num_topo_groups)
        elif self.pattern in ("scanline", "raster"):
            ctx = self._context(y_q)
            scales, means = self._params(prior, ctx)
        else:
            gmap, num_groups = self._gmap(value.shape)
            scales, means = self._grouped_params(y_q, prior, gmap, num_groups)
        lik = self.gaussian.likelihood(y_q, scales, means)
        return {"value_hat": self._apply_gain(y_q, gi), "likelihood": lik}

    def _mc_learned_forward(self, y_q, prior, rng, temperature=None):
        """MC-sampled discrete learned-topogroup training (reference
        pgm_coder.py:370-539): K hard assignment samples per image, rate
        objective -log(mean_k likelihood_k), and a score-function loss_mc
        (REINFORCE eq. 2 of arXiv:1805.10469 / VIMCO leave-one-out control
        variate, pgm_coder.py:70-135) training the predictor logits."""
        K = self.mc_samples
        G = self.num_topo_groups
        temp = self.topo_temperature if temperature is None else temperature
        logits = self.topo_logits(prior)                       # (N,H,W,CG*G)
        lshape = logits.shape[:-1] + (self.num_channel_groups, G)
        logits = logits.reshape(lshape) / temp                 # (N,H,W,CG,G)
        logp = jax.nn.log_softmax(logits, axis=-1)

        gumbel = jax.random.gumbel(rng, (K,) + logits.shape, logits.dtype)
        gmaps_cg = jnp.argmax(logits[None] + gumbel, axis=-1)  # (K,N,H,W,CG)
        # log q(sample): sum over positions/channel-groups of the chosen
        # group's log-probability.
        chosen = jnp.take_along_axis(
            logp[None], gmaps_cg[..., None], axis=-1)[..., 0]  # (K,N,H,W,CG)
        log_q = jnp.sum(chosen, axis=(2, 3, 4)).T              # (N,K)

        gmaps = jax.vmap(self._expand_channel_groups)(gmaps_cg)  # (K,N,H,W,C)
        scales_k, means_k = jax.vmap(
            lambda g: self._grouped_params(y_q, prior, g, G))(gmaps)
        lik_k = jax.vmap(
            lambda s, m: self.gaussian.likelihood(y_q, s, m))(scales_k, means_k)

        lik = jnp.mean(lik_k, axis=0)                          # (N,H,W,C)
        log_weight = jnp.sum(jnp.log(lik_k), axis=(2, 3, 4)).T  # (N,K)

        from ..nn import mc_estimators
        loss_mc = mc_estimators.mc_loss(
            self.learned_estimator, log_weight, log_q, K)
        le = mc_estimators.log_evidence(log_weight, K)
        return {"value_hat": y_q, "likelihood": lik,
                "loss_mc": self.mc_loss_weight * loss_mc,
                "metrics": {"pgm_log_evidence": jnp.mean(le)}}

    def _learned_causal_context(self, y_q, prior, training: bool,
                                temperature=None):
        """Differentiable causal context under a learned group assignment.

        probs[i, g] = softmax(logits/T); an element of group g sees neighbor
        j with weight P(g_j < g) (exclusive cumulative), and its context is
        the probs-weighted mixture over its own group: G dense convs, all
        differentiable w.r.t. the predictor logits.

        temperature: optional traced override of topo_temperature (annealed
        by the trainer's ParamScheduler)."""
        G = self.num_topo_groups
        temp = self.topo_temperature if temperature is None else temperature
        logits = self.topo_logits(prior) / temp
        probs = jax.nn.softmax(logits, axis=-1)           # (N,H,W,G)
        if not training:
            probs = jax.nn.one_hot(jnp.argmax(logits, -1), G)
        cum = jnp.cumsum(probs, axis=-1) - probs          # P(g_j < g), (N,H,W,G)
        ctx = jnp.zeros(y_q.shape[:-1] + (self.context_channels,), y_q.dtype)
        for g in range(G):
            vis = y_q * cum[..., g:g + 1]
            ctx_g = self._context(vis)
            ctx = ctx + ctx_g * probs[..., g:g + 1]
        return ctx

    def _learned_relaxed_params_cg(self, y_q, prior, temperature=None):
        """Continuous-relaxation training with MULTIPLE channel groups (the
        reference's cont-learned-param-gG experiments, abl.py:508-610).

        The predictor emits per-(position, channel-group) logits. Per-channel
        visibility weight of a neighbor is P(its group < g) (exclusive
        cumulative over the soft assignment), and each element's coding
        params are the probs-weighted mixture over its own group's merger
        output — G conv+merger passes, all differentiable w.r.t. the
        predictor logits. Reduces to the ncg=1 relaxation semantics with
        merger-then-mix instead of mix-then-merger."""
        G, CG = self.num_topo_groups, self.num_channel_groups
        temp = self.topo_temperature if temperature is None else temperature
        logits = self.topo_logits(prior) / temp
        lshape = logits.shape[:-1] + (CG, G)
        probs = jax.nn.softmax(logits.reshape(lshape), axis=-1)  # (N,H,W,CG,G)
        cum = jnp.cumsum(probs, axis=-1) - probs
        c = self.channels
        cidx = jnp.minimum(jnp.arange(c) // max(1, c // CG), CG - 1)
        probs_c = probs[..., cidx, :]                            # (N,H,W,C,G)
        cum_c = cum[..., cidx, :]
        params = jnp.zeros(y_q.shape[:-1] + (2 * c,), y_q.dtype)
        for g in range(G):
            vis = y_q * cum_c[..., g]
            ctx_g = self._context(vis)
            p_g = self.merger(jnp.concatenate([prior, ctx_g], -1))
            w = probs_c[..., g]
            params = params + p_g * jnp.concatenate([w, w], -1)
        return jnp.split(params, 2, axis=-1)

    # -- coding-path helpers (jitted via node_fn) ---------------------------------
    def pmf_table(self):
        return self.gaussian.pmf_table()

    def topo_logits(self, prior):
        """Per-position group logits from the prior (learned pattern)."""
        return self.predictor(prior)

    def topo_map_cg_from_prior(self, prior):
        """Hard (argmax) group map at CHANNEL-GROUP granularity:
        (N, H, W, num_channel_groups) int32 — the compact form the fused
        TPU mode ships to the host (~CG/channels of the expanded size)."""
        logits = self.topo_logits(prior)
        lshape = logits.shape[:-1] + (self.num_channel_groups,
                                      self.num_topo_groups)
        return jnp.argmax(logits.reshape(lshape), axis=-1).astype(jnp.int32)

    def topo_map_from_prior(self, prior):
        """Hard (argmax) group map for coding, expanded over channels within
        each channel group: (N, H, W, self.channels) int32."""
        return self._expand_channel_groups(self.topo_map_cg_from_prior(prior))

    def host_expand_channel_groups(self, gmap_cg: np.ndarray) -> np.ndarray:
        """Host (numpy) twin of _expand_channel_groups for the fused mode's
        compact uint8 gmap transfers: (..., CG) ids -> (..., channels)."""
        c = self.channels
        idx = np.arange(c) // max(1, c // max(1, self.num_channel_groups))
        idx = np.minimum(idx, self.num_channel_groups - 1)
        return np.asarray(gmap_cg, np.int32)[..., idx]

    def group_step(self, y_hat, prior, g, gmap=None):
        """One decode/encode group step: context from groups < g, coding
        params for the whole plane. g is a traced scalar -> one compilation."""
        if gmap is None:
            gmap, _ = self._gmap(y_hat.shape)
        if self.context_type == "maskconv3d":
            ctx = jnp.take(self._ctx3d(y_hat), g, axis=3)
        else:
            vis = jnp.where(gmap < g, y_hat, 0.0)
            ctx = self._context(vis, self._key_mask(gmap, g, y_hat), prior)
        scales, means = self._params(prior, ctx)
        indexes = self.gaussian.build_indexes(scales)
        return indexes, means

    def encode_all_groups(self, y, prior, gmap=None, vrlevel=None):
        """FUSED encode: the whole sequential group loop runs on-device in
        one lax.fori_loop — zero host round-trips until the final symbol
        pull. Returns (y_hat, symbols_full, indexes_full); y_hat is in the
        SYNTHESIS domain (inverse-gained) while the AR loop runs gained."""
        g_vec, gi_vec = self._gain(vrlevel)
        y = self._apply_gain(y, g_vec)
        if gmap is None:
            gmap, num_groups = self._gmap(y.shape)
        else:
            num_groups = self.num_topo_groups

        def body(g, carry):
            y_hat, syms, idxs = carry
            if self.context_type == "maskconv3d":
                ctx = jnp.take(self._ctx3d(y_hat), g, axis=3)
            else:
                vis = jnp.where(gmap < g, y_hat, 0.0)
                ctx = self._context(vis, self._key_mask(gmap, g, y_hat),
                                    prior)
            scales, means = self._params(prior, ctx)
            indexes = self.gaussian.build_indexes(scales)
            symbols = jnp.round(y - means).astype(jnp.int32)
            sel = gmap == g
            y_hat = jnp.where(sel, symbols.astype(jnp.float32) + means, y_hat)
            syms = jnp.where(sel, symbols, syms)
            idxs = jnp.where(sel, indexes, idxs)
            return y_hat, syms, idxs

        init = (jnp.zeros_like(y), jnp.zeros(y.shape, jnp.int32),
                jnp.zeros(y.shape, jnp.int32))
        y_hat, syms, idxs = jax.lax.fori_loop(0, num_groups, body, init)
        return self._apply_gain(y_hat, gi_vec), syms, idxs

    def encode_all_groups_packed(self, y, prior, gmap=None, vrlevel=None):
        """encode_all_groups + transfer packing: symbols as int16, indexes
        as uint8, plus an overflow flag (host falls back to int32 via the
        unpacked path if any |symbol| >= 2^15 — rare bypass outliers)."""
        y_hat, syms, idxs = self.encode_all_groups(y, prior, gmap, vrlevel)
        overflow = jnp.any(jnp.abs(syms) >= (1 << 15))
        return (y_hat, syms.astype(jnp.int16), idxs.astype(jnp.uint8), overflow)

    def decode_group_gather(self, y_hat, prior, g, flat_idx, gmap=None):
        """One decode step, transferring only the group's own entries:
        returns (indexes_g, means_g) gathered at flat positions flat_idx.
        indexes_g is uint8 (scale tables are <256 rows) to cut tunnel bytes."""
        indexes, means = self.group_step(y_hat, prior, g, gmap)
        idx_g = jnp.take(indexes.reshape(-1), flat_idx).astype(jnp.uint8)
        means_g = jnp.take(means.reshape(-1), flat_idx)
        return idx_g, means_g

    def decode_scatter(self, y_hat, syms_g, means_g, flat_idx):
        """Scatter decoded group symbols into the buffer on-device."""
        flat = y_hat.reshape(-1)
        flat = flat.at[flat_idx].set(syms_g.astype(jnp.float32) + means_g)
        return flat.reshape(y_hat.shape)

    def decode_step_fused(self, y_hat, prior, syms_prev, means_prev, flat_prev,
                          g, flat_idx, gmap=None):
        """Scatter the previously decoded group AND compute the next group's
        coding params in ONE dispatch (halves host round-trips — dominant
        cost over a remote-TPU tunnel)."""
        y_hat = self.decode_scatter(y_hat, syms_prev, means_prev, flat_prev)
        idx_g, means_g = self.decode_group_gather(y_hat, prior, g, flat_idx, gmap)
        return y_hat, idx_g, means_g

    def num_groups_for(self, shape) -> int:
        _, num = topo_group_map(self.pattern, shape[1], shape[2], shape[3],
                                self.num_channel_groups, self.custom_block,
                                self.channel_splits,
                                num_topo_groups=self.num_topo_groups)
        return num

    # -- slice-layout coding (fixed patterns; zero per-element marshalling) ----
    def group_slice_runs(self, shape):
        """Per-group (phase_h, phase_w, c0, c1) run decomposition, or None
        when the pattern needs the position-gather path (learned/serial
        patterns, odd spatial dims, or CBT_SLICE_LAYOUT=0)."""
        if not _SLICE_LAYOUT or self.pattern == "learned":
            return None
        return topo_group_slice_runs(
            self.pattern, shape[1], shape[2], shape[3],
            self.num_channel_groups, self.channel_splits)

    def canonical_group_positions(self, shape):
        """Host-side flat NHWC positions per group in SLICE-CANONICAL
        order — for each (n, h2, w2): the groups' runs' channels in run
        order. This is the y stream order of the slice-layout coding
        passes; the host C++ coder fallback consumes these positions so
        both producers emit identical streams. None when runs are None."""
        runs = self.group_slice_runs(shape)
        if runs is None:
            return None
        n, h, w, c = shape
        h2, w2 = h // 2, w // 2
        nn_ = np.arange(n)[:, None, None]
        hh = np.arange(h2)[None, :, None]
        ww = np.arange(w2)[None, None, :]
        out = []
        for g_runs in runs:
            parts = [(((nn_ * h + 2 * hh + ph) * w + 2 * ww + pw) * c)
                     [..., None] + np.arange(c0, c1)
                     for (ph, pw, c0, c1) in g_runs]
            out.append(np.concatenate(parts, axis=-1).reshape(-1)
                       .astype(np.int32))
        return out

    def _extract_runs_s2d(self, a2, g_runs):
        """Group elements of an s2d-layout array, canonical order, via
        static channel slices (no gather)."""
        c = self.channels
        parts = [a2[..., (2 * ph + pw) * c + c0:(2 * ph + pw) * c + c1]
                 for (ph, pw, c0, c1) in g_runs]
        return jnp.concatenate(parts, axis=-1).reshape(-1)

    def _insert_runs_s2d(self, y2, vals, g_runs):
        """Write a group's decoded values back into the s2d buffer via
        static channel-slice updates (no scatter)."""
        c = self.channels
        n, h2, w2, _ = y2.shape
        widths = [c1 - c0 for (_, _, c0, c1) in g_runs]
        v = vals.reshape(n, h2, w2, sum(widths))
        off = 0
        for (ph, pw, c0, c1), wd in zip(g_runs, widths):
            col = (2 * ph + pw) * c + c0
            y2 = jax.lax.dynamic_update_slice(
                y2, v[..., off:off + wd], (0, 0, 0, col))
            off += wd
        return y2

    @staticmethod
    def _pad_edge(seq, padded_len):
        """Edge-pad a 1D sequence to the padded segment length (mirrors
        pad_positions' repeat-last convention, so the encoder's duplicate
        symbols line up)."""
        extra = padded_len - seq.shape[0]
        if extra == 0:
            return seq
        return jnp.concatenate(
            [seq, jnp.broadcast_to(seq[-1], (extra,))])

    def collect_stream_symbols(self, y_sym, y_idx, y_pos_segs, gmap=None):
        """(symbols, indexes) in y stream order for the device encoder:
        slice-extraction per group when runs are available (canonical
        order, zero gathers), else the positions-take path. Lengths match
        concat(y_pos_segs) exactly (edge padding included)."""
        runs = None if gmap is not None else self.group_slice_runs(
            y_sym.shape)
        if runs is None:
            order = jnp.concatenate(y_pos_segs)
            return (jnp.take(y_sym.reshape(-1).astype(jnp.int32), order),
                    jnp.take(y_idx.reshape(-1).astype(jnp.int32), order))
        s2 = space_to_depth2(y_sym.astype(jnp.int32))
        i2 = space_to_depth2(y_idx.astype(jnp.int32))
        sym_parts, idx_parts = [], []
        for g, pos in enumerate(y_pos_segs):
            ss = self._extract_runs_s2d(s2, runs[g])
            ii = self._extract_runs_s2d(i2, runs[g])
            sym_parts.append(self._pad_edge(ss, pos.shape[0]))
            idx_parts.append(self._pad_edge(ii, pos.shape[0]))
        return jnp.concatenate(sym_parts), jnp.concatenate(idx_parts)

    # -- host coding hooks (called by LatentGraphCodec) ----------------------------
    def host_group_masks(self, shape, gmap_np=None) -> list:
        """Per-group flat index arrays (host numpy, row-major over NHWC)."""
        import numpy as onp
        if gmap_np is not None:
            flat = onp.asarray(gmap_np).reshape(-1)
            num = self.num_topo_groups
        else:
            gmap, num = jax.device_get(
                topo_group_map(self.pattern, shape[1], shape[2], shape[3],
                               self.num_channel_groups, self.custom_block,
                               self.channel_splits,
                               num_topo_groups=self.num_topo_groups))
            flat = onp.asarray(gmap).reshape(-1)
        return [onp.nonzero(flat == g)[0] for g in range(int(num))]

    def _host_gmap(self, codec, node, prior, shape):
        """Device group map (or None for fixed patterns) + host masks."""
        if self.pattern != "learned":
            return None, self.host_group_masks(shape)
        gmap = codec._node_fn(codec.params, node, "topo_map_from_prior", prior)
        return gmap, self.host_group_masks(shape, np.asarray(gmap))

    def host_encode(self, codec, node, value, prior, pair):
        shape = value.shape
        vr = codec.current_vrlevel()
        gmap, masks = self._host_gmap(codec, node, prior, shape)
        y_hat, symbols, indexes, overflow = codec._node_fn(
            codec.params, node, "encode_all_groups_packed", value, prior,
            gmap, vr)
        if bool(overflow):  # rare: huge bypass symbols do not fit int16
            y_hat, symbols, indexes = codec._node_fn(
                codec.params, node, "encode_all_groups", value, prior, gmap,
                vr)
        # Single device->host pull, then order symbols group-concatenated.
        symbols = np.asarray(symbols).reshape(-1).astype(np.int32)
        indexes = np.asarray(indexes).reshape(-1).astype(np.int32)
        order = np.concatenate([m for m in masks if m.size])
        stream = pair.enc.encode_with_indexes(symbols[order], indexes[order])
        return stream, y_hat

    def host_decode(self, codec, node, stream, prior, shape, pair):
        vr = codec.current_vrlevel()
        gmap, masks = self._host_gmap(codec, node, prior, shape)
        pair.dec.set_stream(stream)
        y_hat = jnp.zeros(shape, jnp.float32)
        prev = None  # (syms_g, means_g, flat_idx) awaiting scatter
        for g, mask in enumerate(masks):
            if mask.size == 0:
                continue
            flat_idx = jnp.asarray(mask)
            if prev is None:
                idx_g, means_g = codec._node_fn(
                    codec.params, node, "decode_group_gather",
                    y_hat, prior, jnp.int32(g), flat_idx, gmap)
            else:
                y_hat, idx_g, means_g = codec._node_fn(
                    codec.params, node, "decode_step_fused",
                    y_hat, prior, prev[0], prev[1], prev[2],
                    jnp.int32(g), flat_idx, gmap)
            syms = pair.dec.decode_stream(
                np.asarray(idx_g).astype(np.int32))
            prev = (jnp.asarray(syms.astype(np.int16)), means_g, flat_idx)
        if prev is not None:
            y_hat = codec._node_fn(codec.params, node, "decode_scatter",
                                   y_hat, prev[0], prev[1], prev[2])
        if self.num_rate_levels > 1 and vr is not None:
            y_hat = codec._node_fn(codec.params, node, "inverse_gain",
                                   y_hat, vr)
        return y_hat

    def inverse_gain(self, y_hat, vrlevel):
        """Map a gained-domain decode buffer to the synthesis domain."""
        _, gi = self._gain(vrlevel)
        return self._apply_gain(y_hat, gi)

    # -- fully-fused on-device decode (TPU-native entropy-coding mode) --------
    def decode_all_groups_device(self, lane_words, prior, positions_segments,
                                 tables, gmap=None, vrlevel=None,
                                 group_ids=None):
        """Decode EVERY topogroup inside one XLA program: per group, compute
        the causal context + coding params (dense MXU convs), then decode
        that group's symbols with the vectorized interleaved-rANS decoder
        (ops/rans_device.py) and scatter them — zero host round-trips.

        positions_segments: tuple of per-group flat position arrays, each
        padded to a multiple of the lane count (pad_positions convention).
        group_ids: static tuple mapping each segment to its group id —
        needed when some groups are EMPTY (learned predictors can starve a
        group) so segment order still matches the encoder's group ids;
        defaults to 0..len(segments)-1.
        """
        from ..ops.rans_device import (
            decode_positions,
            decode_rows,
            init_lane_states,
        )

        n, h, w = prior.shape[0], prior.shape[1], prior.shape[2]
        shape = (n, h, w, self.channels)
        state = init_lane_states(lane_words)
        if group_ids is None:
            group_ids = tuple(range(len(positions_segments)))
        L = lane_words.shape[0]

        runs = None if gmap is not None else self.group_slice_runs(shape)
        if runs is not None:
            # Slice-layout path: the decode buffer lives in 2x2
            # space-to-depth layout where every fixed-pattern group is a
            # set of contiguous channel columns — per-step (indexes,
            # means) rows come from static slices and decoded values go
            # back as slice updates. No position gathers/scatters (the
            # ~29 M elem/s serial unit that dominated this pass).
            y2 = jnp.zeros((n, h // 2, w // 2, 4 * self.channels),
                           jnp.float32)
            for g, pos in zip(group_ids, positions_segments):
                y_hat = depth_to_space2(y2, self.channels)
                indexes, means = self.group_step(y_hat, prior,
                                                 jnp.int32(g), None)
                idx_seq = self._pad_edge(
                    self._extract_runs_s2d(space_to_depth2(indexes),
                                           runs[g]), pos.shape[0])
                mean_seq = self._pad_edge(
                    self._extract_runs_s2d(space_to_depth2(means),
                                           runs[g]), pos.shape[0])
                vals, state = decode_rows(
                    lane_words, idx_seq.reshape(-1, L),
                    mean_seq.reshape(-1, L), state, tables)
                size_g = self._group_size(shape, runs[g])
                y2 = self._insert_runs_s2d(
                    y2, vals.reshape(-1)[:size_g], runs[g])
            y_hat = depth_to_space2(y2, self.channels)
            _, gi = self._gain(vrlevel)
            return self._apply_gain(y_hat, gi)

        y_flat = jnp.zeros(int(np.prod(shape)), jnp.float32)
        for g, pos in zip(group_ids, positions_segments):
            y_hat = y_flat.reshape(shape)
            indexes, means = self.group_step(y_hat, prior, jnp.int32(g), gmap)
            y_flat, state = decode_positions(
                lane_words, pos, indexes.reshape(-1), state, tables,
                y_flat, means.reshape(-1))
        _, gi = self._gain(vrlevel)
        return self._apply_gain(y_flat.reshape(shape), gi)

    @staticmethod
    def _group_size(shape, g_runs) -> int:
        n, h, w, _ = shape
        return (n * (h // 2) * (w // 2)
                * sum(c1 - c0 for (_, _, c0, c1) in g_runs))
