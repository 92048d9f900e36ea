"""Sub-config: the full prior-coder zoo as a selectable codec slot.

Parity: the reference's prior-coder config modules (configs/nnmodules
prior_coder builders) — one addressable slot choosing any codable coder
from the zoo, with shared capacity slots.
"""

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
from cbench_basic_tpu import prior_coders as pz

_ZOO = {
    "categorical": lambda L, K, D: pz.CategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "gauss_embedding": lambda L, K, D: pz.GaussianEmbeddingCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "stick_breaking": lambda L, K, D: pz.StickBreakingPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "ar_categorical": lambda L, K, D: pz.AutoregressiveCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "igr": lambda L, K, D: pz.IGRCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "c2d": lambda L, K, D: pz.ContinuousToDiscretePriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "c2vq": lambda L, K, D: pz.GaussianC2VQPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "vq": lambda L, K, D: pz.VQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "gaussian_vq": lambda L, K, D: pz.GaussianVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "sqvae": lambda L, K, D: pz.SQVAEPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "univar_gauss_dvq": lambda L, K, D: pz.UnivarGaussianDistributionVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "lr_multivar_dvq": lambda L, K, D: pz.LRMultivarGaussianDistributionVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "vq_gauss_embedding": lambda L, K, D: pz.VQGaussianEmbeddingPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "multichannel_vq": lambda L, K, D: pz.MultiChannelVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D),
    "multichannel_vq_ar": lambda L, K, D: pz.MultiChannelVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D,
        use_autoregressive_prior=True),
    "categorical_gaussian": lambda L, K, D: pz.CategoricalGaussianPriorCoder(
        latent_dims=L, num_embeddings=K),
    "embedding_std_normal": lambda L, K, D:
        pz.EmbeddingStandardNormalPriorCategoricalCoder(
            latent_dims=L, num_embeddings=K, embedding_dim=D),
    # round-3 zoo tail (reference dist_ar_cat_svq / _svq_vqp / dist_c2vq /
    # dist_cat_embedding_gp config modules)
    "stochastic_vq_ar": lambda L, K, D: pz.StochasticVQARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "stochastic_vq_ar_vmf": lambda L, K, D: pz.StochasticVQARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        distance_method="vmf"),
    "vq_prior_stochastic_vq": lambda L, K, D:
        pz.VQPriorStochasticVQARPriorCoder(
            latent_dims=L, num_embeddings=K, embedding_dim=D),
    "continuous_to_vq": lambda L, K, D: pz.ContinuousToVQPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
    "embedding_gmm_prior": lambda L, K, D:
        pz.EmbeddingGaussianPriorCategoricalCoder(
            latent_dims=L, num_embeddings=K, embedding_dim=D),
}


def _y_in_channels(coder_name, coder):
    return getattr(coder, "in_channels", None)


def _build(coder="vq", latent_dims=8, num_embeddings=64, embedding_dim=16,
           n=128, lmbda=0.01, seed=0):
    y_coder = _ZOO[coder](latent_dims, num_embeddings, embedding_dim)
    cin = _y_in_channels(coder, y_coder) or latent_dims * embedding_dim
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=lmbda), "y": y_coder},
        edges={"x_y": AnalysisTransform(n, cin),
               "y_x": SynthesisTransform(n)},
        inference_wiring=(("x_y", "x", "y"),),
        generative_wiring=(("y_x", "y", "x"),),
        generative_order=("y", "x"))
    specs = {"x": (3, 1), "y": (latent_dims, 16)}
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    coder=ParamSlot("coder", choices=sorted(_ZOO), default="vq"),
    latent_dims=ParamSlot("L", default=8),
    num_embeddings=ParamSlot("K", default=64),
    embedding_dim=ParamSlot("D", default=16),
    n=ParamSlot("N", default=128),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("prior_zoo")
