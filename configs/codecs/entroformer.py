"""Sub-config: EntroFormer attention-context topogroup codec.

Parity: the reference's GaussianEntroFormer codec configs
(pgm_coder.py:3217 family) as an addressable sub-config. Slots: pattern /
depth / heads / dim_embed / window / lmbda.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.builders import build_topogroup_hyperprior_graph


def _build(pattern="checkerboard", num_channel_groups=1, n=192, m=192,
           lmbda=0.01, depth=2, heads=6, dim_embed=192, window=0, seed=0):
    model, specs = build_topogroup_hyperprior_graph(
        N=n, M=m, lmbda=lmbda, pattern=pattern,
        num_channel_groups=num_channel_groups,
        context_type="attention", attn_depth=depth, attn_heads=heads,
        attn_dim_embed=dim_embed, attn_window=window)
    codec = LatentGraphCodec(model, specs, lmbda=lmbda, coding_mode="tpu")
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    pattern=ParamSlot("pattern", choices=[
        "checkerboard", "raster2x2", "channelwise", "elic", "learned"],
        default="checkerboard"),
    num_channel_groups=ParamSlot("ncg", default=1),
    n=ParamSlot("N", default=192),
    m=ParamSlot("M", default=192),
    lmbda=ParamSlot("lmbda", default=0.01),
    depth=ParamSlot("depth", default=2),
    heads=ParamSlot("heads", default=6),
    dim_embed=ParamSlot("dim_embed", default=192),
    window=ParamSlot("window", default=0),
).set_override_name("entroformer")
