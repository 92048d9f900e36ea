"""Latent-graph entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/latent_graph.py
(LatentGraphicalANSEntropyCoder, latent_graph.py:306). Maps to
LatentGraphCodec over a default hyperprior graph; node/edge structure is
injected via the `model`/`node_specs` slots (see configs/presets)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.builders import build_hyperprior_graph


def _build(N=128, M=128, lmbda=0.01, **kwargs):
    model, node_specs = build_hyperprior_graph(N=N, M=M, lmbda=lmbda)
    return LatentGraphCodec(model, node_specs, lmbda=lmbda, **kwargs)


config = ClassBuilder(
    _build,
    N=ParamSlot("N", default=128),
    M=ParamSlot("M", default=128),
    lmbda=ParamSlot("lmbda", default=0.01),
    coding_mode=ParamSlot("coding_mode", default="compat",
                          choices={"compat": "compat", "tpu": "tpu"}),
).set_override_name("latent_graph")
