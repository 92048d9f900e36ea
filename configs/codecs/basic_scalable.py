"""Sub-config: the full BaSIC computationally-scalable codec (slimmable PGM
edges + topogroup AR), single-λ; the grouped 4-λ variant lives in
configs/presets/lossy_latent_graph_scalable_ar_models.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.builders import build_basic_scalable_graph


def _build(widths=(48, 72, 96, 144, 192), n=192, m=192, lmbda=0.01,
           pattern="elic", num_channel_groups=5, num_complex_levels=None,
           seed=0):
    model, specs, levels = build_basic_scalable_graph(
        N=n, M=m, lmbda=lmbda, widths=widths, pattern=pattern,
        num_channel_groups=num_channel_groups,
        num_complex_levels=num_complex_levels)
    codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                             lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=(48, 72, 96, 144, 192)),
    n=ParamSlot("N", default=192),
    m=ParamSlot("M", default=192),
    lmbda=ParamSlot("lmbda", default=0.01),
    pattern=ParamSlot("pattern", default="elic"),
    num_channel_groups=ParamSlot("ncg", default=5),
    num_complex_levels=ParamSlot("sclevels", default=None),
).set_override_name("basic_scalable")
