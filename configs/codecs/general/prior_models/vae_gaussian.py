"""VAE-with-Gaussian-posterior bits-back codec sub-config.

Parity: reference configs/codecs/general/prior_models/vae_gaussian.py
(VAE prior model with Gaussian prior coder). Maps to VAEBBANSCodec — the
Gaussian-posterior bits-back construction over the repo VAE."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.bbans import VAEBBANSCodec
from cbench_basic_tpu.nn.models import VAE


def _build(latent_channels=4, hidden=(8, 16), image_shape=(32, 32, 3),
           z_precision=6, x_sigma=0.1, seed=0):
    import jax
    import jax.numpy as jnp

    vae = VAE(latent_channels=latent_channels, hidden=tuple(hidden))
    x0 = jnp.zeros((1,) + tuple(image_shape))
    params = vae.init(jax.random.PRNGKey(seed), x0, training=True,
                      rng=jax.random.PRNGKey(seed + 1))["params"]
    return VAEBBANSCodec(vae, params, image_shape, z_precision=z_precision,
                         x_sigma=x_sigma)


config = ClassBuilder(
    _build,
    latent_channels=ParamSlot("latent_channels", default=4),
    image_shape=ParamSlot("image_shape", default=(32, 32, 3)),
).set_override_name("vae_gaussian")
