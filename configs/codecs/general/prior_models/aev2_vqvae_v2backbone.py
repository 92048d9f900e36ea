"""Autoencoder-v2 prior model on the VQ-VAE v2 backbone (the AE-v2
composition with a vqvae encoder/decoder pair).

Parity: reference configs/codecs/general/prior_models/
aev2_vqvae_v2backbone.py (VQVAEV2BackboneAutoEncoderPriorModel)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import LossyDummyCoder
from cbench_basic_tpu.nn.models.vqvae import VQVAEDecoder, VQVAEEncoder
from cbench_basic_tpu.prior_coders import VQPriorCoder


class _Enc(VQVAEEncoder):
    def __call__(self, x, **kw):
        return super().__call__(x)


class _Dec(VQVAEDecoder):
    def __call__(self, z, **kw):
        return super().__call__(z)


def _build(hidden=64, dim=32, num_codes=128, lmbda=0.01, seed=0):
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=lmbda),
                     "y": VQPriorCoder(num_groups=dim // 8,
                                       num_embeddings=num_codes,
                                       embedding_dim=8)},
        edges={"x_y": _Enc(hidden=hidden, dim=dim),
               "y_x": _Dec(hidden=hidden)},
        inference_wiring=(("x_y", "x", "y"),),
        generative_wiring=(("y_x", "y", "x"),),
        generative_order=("y", "x"))
    specs = {"x": (3, 1), "y": (dim // 8, 4)}
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=64),
    dim=ParamSlot("dim", default=32),
    num_codes=ParamSlot("num_codes", default=128),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("aev2_vqvae_v2backbone")
