"""Sub-config: Ballé/Minnen hyperprior codec (mean-scale switchable)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.builders import build_hyperprior_graph


def _build(n=192, m=192, lmbda=0.01, mean_scale=True, seed=0):
    model, specs = build_hyperprior_graph(N=n, M=m, lmbda=lmbda,
                                          mean_scale=mean_scale)
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    n=ParamSlot("N", default=192),
    m=ParamSlot("M", default=192),
    lmbda=ParamSlot("lmbda", default=0.01),
    mean_scale=ParamSlot("mean_scale", default=True),
).set_override_name("hyperprior")
