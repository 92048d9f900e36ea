"""Prebuilt latent-graph model assemblies.

Parity: the graph wirings defined by the reference presets
(configs/presets/lossy_latent_graph_scalable_ar_models.py:73-171): topo
orders x->y->z (inference) and z->y->x (generative), analysis/synthesis
edges between x and y, hyper edges between y and z.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from ..nn.models.hyperprior import (
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    SynthesisTransform,
)
from .latent_graph import LatentGraphModel
from .node_coders import FactorizedCoder, GaussianCoder, LossyDummyCoder
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
                                     context_channels: Optional[int] = None):
    """BaSIC-style graph: hyperprior + intra-node topogroup AR context on y.

    Parity: the preset's y-coder = topogroup maskconv coder
    (lossy_latent_graph_scalable_ar_models.py:119-127) over a
    GaussianChannelGroupMaskConv2DTopoGroupPGMPriorCoder.
    """
    node_coders = {
        "x": LossyDummyCoder(lmbda=lmbda),
        "y": TopoGroupGaussianCoder(
            channels=M, pattern=pattern,
            num_channel_groups=num_channel_groups,
            context_channels=context_channels or 2 * M),
        "z": FactorizedCoder(N),
    }
    edges = {
        "x_y": AnalysisTransform(N, M),
        "y_z": HyperAnalysisTransform(N, use_abs=False),
        "z_y": HyperSynthesisTransform(N, out_channels=2 * M),
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
