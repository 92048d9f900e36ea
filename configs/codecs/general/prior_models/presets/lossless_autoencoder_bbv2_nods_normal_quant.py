"""Lossless-AE bbv2 preset: no extra downsample, Gaussian.

Parity: reference configs/codecs/general/prior_models/presets/lossless_autoencoder_bbv2_nods_normal_quant.py.
Variant axes: backbone depth (shallow = 2 downsample stages), hidden width
(c32), latent ratio (r4/r8 = groups), quantization (normal_quant = Gaussian
prior coder; none = VQ), ps = pixel-shuffle-style wider stem, nods/skip =
stage-count tweaks.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config.import_utils import import_config_from_file

_HERE = os.path.dirname(os.path.abspath(__file__))
config = import_config_from_file(os.path.join(
    _HERE, "..", "lossless_autoencoder_bbv2.py")).clone(copy_slot_data=True)
config.update_slot_params(prior_coder="gaussian", num_stages=1)
config = config.set_override_name("lossless_autoencoder_bbv2_nods_normal_quant")
