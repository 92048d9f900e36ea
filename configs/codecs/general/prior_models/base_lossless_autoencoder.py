"""Base LOSSLESS autoencoder prior model: pluggable prior-coder bottleneck
with discretized-logistic cross-entropy reconstruction.

Parity: reference configs/codecs/general/prior_models/
base_lossless_autoencoder.py (BaseLosslessAutoEncoderPriorModel,
prior_model/autoencoder_v2.py — distortion_type="ce", prior_coder slot)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import LossyDummyCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    SynthesisTransform,
)
from cbench_basic_tpu.prior_coders import (
    CategoricalPriorCoder,
    GaussianPriorCoder,
    GaussianVQPriorCoder,
    SQVAEPriorCoder,
    VQPriorCoder,
)

# Constructor adapters: each zoo class has its own latent geometry
# (VQ-family: groups x embedding_dim; categorical: planes x K; gaussian:
# value carries (mu, logvar) so channels = cin // 2).
_CODERS = {
    "categorical": lambda g, K, D: CategoricalPriorCoder(
        latent_dims=g, num_embeddings=K, embedding_dim=D),
    "gaussian": lambda g, K, D: GaussianPriorCoder(channels=g * D // 2),
    "gaussian_vq": lambda g, K, D: GaussianVQPriorCoder(
        num_groups=g, num_embeddings=K, embedding_dim=D),
    "sqvae": lambda g, K, D: SQVAEPriorCoder(
        num_groups=g, num_embeddings=K, embedding_dim=D),
    "vq": lambda g, K, D: VQPriorCoder(
        num_groups=g, num_embeddings=K, embedding_dim=D),
}


def _build(prior_coder='gaussian', num_groups=8, num_embeddings=64,
           embedding_dim=16, hidden=64, lmbda=1.0, seed=0,
           num_stages=2, coder_obj=None):
    y_coder = coder_obj if coder_obj is not None else _CODERS[prior_coder](
        num_groups, num_embeddings, embedding_dim)
    cin = num_groups * embedding_dim
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=lmbda, distortion="ce"),
                      "y": y_coder},
        edges={"x_y": AnalysisTransform(hidden, cin, num_stages=num_stages),
                "y_x": SynthesisTransform(hidden, num_stages=num_stages)},
        inference_wiring=(("x_y", "x", "y"),),
        generative_wiring=(("y_x", "y", "x"),),
        generative_order=("y", "x"))
    specs = {"x": (3, 1), "y": (num_groups, 2 ** num_stages)}
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    prior_coder=ParamSlot("prior_coder", choices=sorted(_CODERS),
                          default='gaussian'),
    coder_obj=ParamSlot("coder_obj", default=None),
    num_groups=ParamSlot("groups", default=8),
    num_embeddings=ParamSlot("K", default=64),
    embedding_dim=ParamSlot("D", default=16),
    hidden=ParamSlot("hidden", default=64),
    num_stages=ParamSlot("num_stages", default=2),
    lmbda=ParamSlot("lmbda", default=1.0),
).set_override_name("base_lossless_autoencoder")
