"""VAE backbone with a VQ prior-coder bottleneck.

Parity: reference configs/codecs/general/prior_models/vae_vq.py
(base_lossless_autoencoder with prior_coders/vq plugged into the
prior_coder slot)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_config_from_file

_HERE = os.path.dirname(os.path.abspath(__file__))
config = import_config_from_file(
    os.path.join(_HERE, "base_lossless_autoencoder.py")).clone(
    copy_slot_data=True)
config.update_slot_params(prior_coder="vq")
config = config.set_override_name("vae_vq")
