"""Layer sub-config: VAE encoder stack (reference vae module encoder).

Parity: reference configs/nnmodules/layers/vae_encoder.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.vae import VAEEncoder

config = ClassBuilder(
    VAEEncoder,
    latent_channels=ParamSlot("latent_channels", default=64),
    hidden=ParamSlot("hidden", default=(32, 64, 128)),
).set_override_name("vae_encoder")
