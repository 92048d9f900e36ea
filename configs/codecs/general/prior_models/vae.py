"""VAE prior-model sub-config.

Parity: reference configs/codecs/general/prior_models/vae.py
(VAE prior model, nn/models/vae.py). Builds the flax VAE module; trainers
and bits-back codecs consume it (see entropy_models/bbans/bbans_bbv2.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models import VAE

config = ClassBuilder(
    VAE,
    latent_channels=ParamSlot("latent_channels", default=64),
    hidden=ParamSlot("hidden", default=(32, 64, 128)),
).add_all_kwargs_as_param_slot().set_override_name("vae")
