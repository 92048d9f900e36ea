"""Prebuilt latent-graph model assemblies.

Parity: the graph wirings defined by the reference presets
(configs/presets/lossy_latent_graph_scalable_ar_models.py:73-171): topo
orders x->y->z (inference) and z->y->x (generative), analysis/synthesis
edges between x and y, hyper edges between y and z.
"""

from __future__ import annotations

from typing import Optional

from ..nn.models.hyperprior import (
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    SynthesisTransform,
)
from ..nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableAnalysisTransform,
    SlimmableHyperAnalysisTransform,
    SlimmableHyperSynthesisTransform,
    SlimmableSynthesisTransform,
)
from .latent_graph import LatentGraphModel
from .node_coders import (
    FactorizedCoder,
    GaussianCoder,
    LossyDummyCoder,
    SlimmableFactorizedCoder,
)
from .topogroup import TopoGroupGaussianCoder


def build_hyperprior_graph(N: int = 192, M: int = 192, lmbda: float = 0.01,
                           mean_scale: bool = True):
    """Ballé/Minnen hyperprior expressed as a latent graph.

    Returns (model, node_specs) for LatentGraphCodec.
    """
    node_coders = {
        "x": LossyDummyCoder(lmbda=lmbda),
        "y": GaussianCoder(M, mean_scale=mean_scale),
        "z": FactorizedCoder(N),
    }
    edges = {
        "x_y": AnalysisTransform(N, M),
        "y_z": HyperAnalysisTransform(N, use_abs=not mean_scale),
        "z_y": HyperSynthesisTransform(N, out_channels=(2 * M if mean_scale else M)),
        "y_x": SynthesisTransform(N),
    }
    model = LatentGraphModel(
        node_coders=node_coders,
        edges=edges,
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"),
    )
    node_specs = {"x": (3, 1), "y": (M, 16), "z": (N, 64)}
    return model, node_specs


def build_topogroup_hyperprior_graph(N: int = 192, M: int = 192,
                                     lmbda: float = 0.01,
                                     pattern: str = "checkerboard",
                                     num_channel_groups: int = 1,
                                     context_channels: Optional[int] = None,
                                     y_stride: int = 16,
                                     distortion: str = "mse",
                                     **coder_kwargs):
    """BaSIC-style graph: hyperprior + intra-node topogroup AR context on y.

    Parity: the preset's y-coder = topogroup maskconv coder
    (lossy_latent_graph_scalable_ar_models.py:119-127) over a
    GaussianChannelGroupMaskConv2DTopoGroupPGMPriorCoder.

    y_stride: spatial x->y downsampling (power of two; 16 = reference
    geometry, fewer analysis stages otherwise). z is always 4x below y.
    coder_kwargs: extra TopoGroupGaussianCoder fields — e.g.
    context_type="attention" (EntroFormer context) or "maskconv3d"
    (channel-causal 3D conv), learned_estimator, attn_window.
    """
    num_stages = int(y_stride).bit_length() - 1
    if 2 ** num_stages != y_stride:
        raise ValueError(f"y_stride must be a power of two, got {y_stride}")
    node_coders = {
        # distortion: "mse" | "ms_ssim" (the ft-ssim stage-2 objective,
        # presets/lossy_latent_graph_scalable_ar_models.py:708-727) | "ce"
        "x": LossyDummyCoder(lmbda=lmbda, distortion=distortion),
        "y": TopoGroupGaussianCoder(
            channels=M, pattern=pattern,
            num_channel_groups=num_channel_groups,
            context_channels=context_channels or 2 * M,
            **coder_kwargs),
        "z": FactorizedCoder(N),
    }
    edges = {
        "x_y": AnalysisTransform(N, M, num_stages=num_stages),
        "y_z": HyperAnalysisTransform(N, use_abs=False),
        "z_y": HyperSynthesisTransform(N, out_channels=2 * M),
        "y_x": SynthesisTransform(N, num_stages=num_stages),
    }
    model = LatentGraphModel(
        node_coders=node_coders,
        edges=edges,
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"),
    )
    node_specs = {"x": (3, 1), "y": (M, y_stride), "z": (N, 4 * y_stride)}
    return model, node_specs


def build_basic_scalable_graph(N: int = 192, M: int = 192, lmbda: float = 0.01,
                               widths=DEFAULT_WIDTHS,
                               pattern: str = "elic",
                               num_channel_groups: int = 5,
                               context_channels: Optional[int] = None,
                               flops_weight: float = 0.0,
                               flops_limit: float = 0.0,
                               num_complex_levels: Optional[int] = None,
                               backbone: str = "hyperprior",
                               distortion: str = "mse",
                               combined_y: bool = False):
    """The BaSIC computationally-scalable model: slimmable PGM edges
    (inter-node BayesNet over width levels) + topogroup AR y-coder
    (intra-node BayesNet).

    Parity: preset `hyperprior-ar-sc-slimmable-full-dynamic-grouped`
    (lossy_latent_graph_scalable_ar_models.py:692; graph wiring :73-171 with
    mid_channels_list=[48,72,96,144,192], topogroup y coder :119-127,
    entropy-bottleneck z coder :128-133, FLOPs loss via λC).

    Returns (model, node_specs, complexity_levels): complexity_levels is the
    default uniform mapping (sclevel -> same width index on every edge);
    the greedy complexity search replaces it with searched mixtures.
    """
    widths = tuple(widths)
    L = len(widths)
    if combined_y:
        # the `-combined-dynamic-entropy-coder-grouped` preset: the y node's
        # entropy coder is a blend of AR structures whose mixture weight is
        # itself dynamic (reference pgm_coder.py:632 CombinedNNTrainablePGM)
        from .combined_coder import CombinedTopoGroupCoder
        y_coder = CombinedTopoGroupCoder(
            channels=M,
            patterns=("checkerboard", pattern),
            channel_groups=(1, num_channel_groups),
            context_channels=context_channels or 2 * M)
    else:
        y_coder = TopoGroupGaussianCoder(
            channels=M, pattern=pattern,
            num_channel_groups=num_channel_groups,
            context_channels=context_channels or 2 * M)
    node_coders = {
        "x": LossyDummyCoder(lmbda=lmbda, distortion=distortion),
        "y": y_coder,
        "z": FactorizedCoder(N),
    }
    # backbone selects the slimmable transform family for the four edges
    # (parity: the reference's "newbb" presets swap the hyperprior conv
    # stacks for Cheng2020 / ELIC residual backbones,
    # lossy_latent_graph_scalable_ar_models_newbb.py over
    # slimmable_cheng2020_* / slimmable_elic_* pgm layers).
    if backbone == "hyperprior":
        transforms = (SlimmableAnalysisTransform(widths, M),
                      SlimmableHyperAnalysisTransform(widths, N, M),
                      SlimmableHyperSynthesisTransform(
                          widths, N, out_channels=2 * M),
                      SlimmableSynthesisTransform(widths, M))
    elif backbone in ("cheng2020", "cheng2020_noattn"):
        from ..nn import backbones as bb
        attn = backbone == "cheng2020"
        transforms = (
            bb.Cheng2020AnalysisTransform(widths, M=M, attn=attn),
            bb.Cheng2020HyperAnalysisTransform(widths, N=N, M=M),
            bb.Cheng2020HyperSynthesisTransform(widths, N=N,
                                                out_channels=2 * M),
            bb.Cheng2020SynthesisTransform(widths, M=M, attn=attn))
    elif backbone in ("elic", "elic_noattn"):
        from ..nn import backbones as bb
        attn = backbone == "elic"
        transforms = (
            bb.ELICAnalysisTransform(widths, M=M, attn=attn),
            bb.ELICHyperAnalysisTransform(widths, N=N, M=M),
            bb.ELICHyperSynthesisTransform(widths, N=N,
                                           out_channels=2 * M),
            bb.ELICSynthesisTransform(widths, M=M, attn=attn))
    else:
        raise ValueError(f"unknown backbone {backbone!r}")
    t_xy, t_yz, t_zy, t_yx = transforms
    edges = {
        "x_y": PGMSlimmableEdge(t_xy, num_levels=L),
        "y_z": PGMSlimmableEdge(t_yz, num_levels=L),
        "z_y": PGMSlimmableEdge(t_zy, num_levels=L),
        "y_x": PGMSlimmableEdge(t_yx, num_levels=L),
    }
    model = LatentGraphModel(
        node_coders=node_coders,
        edges=edges,
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"),
        train_edge_kwargs={name: {"soft": True} for name in edges},
        flops_weight=flops_weight,
        flops_limit=flops_limit,
    )
    node_specs = {"x": (3, 1), "y": (M, 16), "z": (N, 64)}
    n_levels = num_complex_levels or L
    complexity_levels = [
        {name: min(int(round(i * (L - 1) / max(n_levels - 1, 1))), L - 1)
         for name in edges}
        for i in range(n_levels)
    ]
    return model, node_specs, complexity_levels


HP_VARIANTS = ("slimmable-full", "slimmable-dynamic", "usdecoder-dynamic",
               "groupconv-full", "static-backbone")


def build_scalable_hyperprior_graph(variant: str = "slimmable-dynamic",
                                    N: int = 192, M: int = 192,
                                    lmbda: float = 0.01,
                                    widths=DEFAULT_WIDTHS,
                                    groups: int = 4,
                                    mid_per_group: int = 48,
                                    flops_weight: float = 0.0,
                                    flops_limit: float = 0.0):
    """Hyperprior-variant experiment graphs (NO intra-node AR on y).

    Parity: configs/lossy_graph_scalable_exp_hp.py's five grouped
    experiments (:607-778):
      slimmable-full      SlimCAE — all transforms slimmable, z bottleneck
                          channel list follows the width level (:619-643)
      slimmable-dynamic   + dynamic width selection / FLOPs loss (:647-672)
      usdecoder-dynamic   static encoder, slimmable decoder (:674-697,
                          hyperprior_scalable_computation_usdecoder :466)
      groupconv-full      group-conv PGM backbone, complexity = active
                          channel groups (:700-722, nn/groupconv.py)
      static-backbone     static transforms; scalability ablation control
                          (:725-747, coder config :572-606)

    Returns (model, node_specs, complexity_levels).
    """
    widths = tuple(widths)
    L = len(widths)
    y_coder = GaussianCoder(M, mean_scale=True)
    x_coder = LossyDummyCoder(lmbda=lmbda)

    if variant == "static-backbone":
        node_coders = {"x": x_coder, "y": y_coder, "z": FactorizedCoder(N)}
        edges = {
            "x_y": AnalysisTransform(N, M),
            "y_z": HyperAnalysisTransform(N, use_abs=False),
            "z_y": HyperSynthesisTransform(N, out_channels=2 * M),
            "y_x": SynthesisTransform(N),
        }
        train_kw = None
        levels = [{}]
    elif variant == "groupconv-full":
        from ..nn.groupconv import GroupConvTransform
        node_coders = {"x": x_coder, "y": y_coder, "z": FactorizedCoder(N)}
        gc = dict(groups=groups, num_levels=L, mid_per_group=mid_per_group)
        edges = {
            "x_y": PGMSlimmableEdge(GroupConvTransform(
                kind="a", in_channels=3, out_channels=M, **gc), num_levels=L),
            "y_z": PGMSlimmableEdge(GroupConvTransform(
                kind="ha", in_channels=M, out_channels=N, **gc), num_levels=L),
            "z_y": PGMSlimmableEdge(GroupConvTransform(
                kind="hs", in_channels=N, out_channels=2 * M, **gc),
                num_levels=L),
            "y_x": PGMSlimmableEdge(GroupConvTransform(
                kind="s", in_channels=M, out_channels=3, **gc), num_levels=L),
        }
        train_kw = {name: {"soft": True} for name in edges}
        levels = [{name: i for name in edges} for i in range(L)]
    elif variant in ("slimmable-full", "slimmable-dynamic",
                     "usdecoder-dynamic"):
        z_coder = (SlimmableFactorizedCoder(N, channels_list=widths)
                   if variant == "slimmable-full" else FactorizedCoder(N))
        node_coders = {"x": x_coder, "y": y_coder, "z": z_coder}
        if variant == "usdecoder-dynamic":
            edges = {
                "x_y": AnalysisTransform(N, M),
                "y_z": HyperAnalysisTransform(N, use_abs=False),
                "z_y": PGMSlimmableEdge(SlimmableHyperSynthesisTransform(
                    widths, N, out_channels=2 * M), num_levels=L),
                "y_x": PGMSlimmableEdge(SlimmableSynthesisTransform(
                    widths, M), num_levels=L),
            }
            slim = ("z_y", "y_x")
        else:
            edges = {
                "x_y": PGMSlimmableEdge(
                    SlimmableAnalysisTransform(widths, M), num_levels=L),
                "y_z": PGMSlimmableEdge(
                    SlimmableHyperAnalysisTransform(widths, N, M),
                    num_levels=L),
                "z_y": PGMSlimmableEdge(SlimmableHyperSynthesisTransform(
                    widths, N, out_channels=2 * M), num_levels=L),
                "y_x": PGMSlimmableEdge(
                    SlimmableSynthesisTransform(widths, M), num_levels=L),
            }
            slim = tuple(edges)
        train_kw = {name: {"soft": True} for name in slim}
        levels = [{name: i for name in slim} for i in range(L)]
    else:
        raise ValueError(f"unknown hp variant {variant!r}; "
                         f"choose from {HP_VARIANTS}")

    model = LatentGraphModel(
        node_coders=node_coders,
        edges=edges,
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"),
        train_edge_kwargs=train_kw,
        flops_weight=flops_weight if "dynamic" in variant else 0.0,
        flops_limit=flops_limit,
    )
    node_specs = {"x": (3, 1), "y": (M, 16), "z": (N, 64)}
    return model, node_specs, levels
