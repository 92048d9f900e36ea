"""Pyramid (multi-scale residual) VQ-VAE prior-model sub-config.

Parity: reference configs/codecs/general/prior_models/vqvae_pvq.py
(pyramid VQ variant). Same codec as vqvae.py with quantizer="pyramid"."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config.import_utils import import_config_from_file

config = import_config_from_file(
    os.path.join(os.path.dirname(__file__), "vqvae.py")
).update_slot_params(quantizer="pyramid").set_override_name("vqvae_pvq")
