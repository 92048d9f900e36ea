"""Sub-config: VQ prior-coder codec (prior_coders zoo as a graph node)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import LossyDummyCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    SynthesisTransform,
)
from cbench_basic_tpu.prior_coders import (
    GaussianVQPriorCoder,
    SQVAEPriorCoder,
    VQPriorCoder,
)

_CODERS = {"vq": VQPriorCoder, "gaussian_vq": GaussianVQPriorCoder,
           "sqvae": SQVAEPriorCoder}


def _build(coder="vq", num_groups=8, num_embeddings=64, embedding_dim=16,
           n=128, lmbda=0.01, seed=0):
    y_coder = _CODERS[coder](num_groups=num_groups,
                             num_embeddings=num_embeddings,
                             embedding_dim=embedding_dim)
    cin = num_groups * embedding_dim
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=lmbda), "y": y_coder},
        edges={"x_y": AnalysisTransform(n, cin),
               "y_x": SynthesisTransform(n)},
        inference_wiring=(("x_y", "x", "y"),),
        generative_wiring=(("y_x", "y", "x"),),
        generative_order=("y", "x"))
    specs = {"x": (3, 1), "y": (num_groups, 16)}
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    coder=ParamSlot("coder", choices=list(_CODERS), default="vq"),
    num_groups=ParamSlot("groups", default=8),
    num_embeddings=ParamSlot("K", default=64),
    embedding_dim=ParamSlot("D", default=16),
    n=ParamSlot("N", default=128),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("vq_codec")
