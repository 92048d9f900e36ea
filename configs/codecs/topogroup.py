"""Sub-config: non-slimmable topogroup-AR codec with addressable slots.

Parity: the reference's per-codec sub-config modules (configs/codecs/**,
one file per codec exposing ParamSlots; SURVEY.md §2.7). Slots: pattern /
num_channel_groups / M / N / lmbda / context.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.builders import build_topogroup_hyperprior_graph


def _build(pattern="elic", num_channel_groups=5, n=192, m=192,
           lmbda=0.01, context_channels=None, num_rate_levels=1, seed=0):
    model, specs = build_topogroup_hyperprior_graph(
        N=n, M=m, lmbda=lmbda, pattern=pattern,
        num_channel_groups=num_channel_groups,
        context_channels=context_channels,
        num_rate_levels=num_rate_levels)
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    pattern=ParamSlot("pattern", choices=[
        "checkerboard", "scanline", "raster2x2", "channelwise", "elic",
        "learned"], default="elic"),
    num_channel_groups=ParamSlot("ncg", default=5),
    n=ParamSlot("N", default=192),
    m=ParamSlot("M", default=192),
    lmbda=ParamSlot("lmbda", default=0.01),
    context_channels=ParamSlot("ctx", default=None),
    # gain-vector variable rate (autoencoder-v2 parity): >1 makes the codec
    # variable-rate within one parameter set.
    num_rate_levels=ParamSlot("vr", default=1),
).set_override_name("topogroup")
