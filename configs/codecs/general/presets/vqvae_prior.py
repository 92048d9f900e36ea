"""VQ-VAE prior codec preset (parity: reference presets/vqvae_prior.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config.import_utils import import_config_from_file

_G = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

config = import_config_from_file(
    os.path.join(_G, "prior_models", "vqvae.py")) \
    .set_override_name("vqvae_prior")
