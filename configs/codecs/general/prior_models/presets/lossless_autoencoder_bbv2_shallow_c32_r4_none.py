"""Lossless-AE bbv2 preset: shallow, 32-wide, 4-group latent, VQ.

Parity: reference configs/codecs/general/prior_models/presets/lossless_autoencoder_bbv2_shallow_c32_r4_none.py.
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
config.update_slot_params(prior_coder="vq", num_stages=2, hidden=32, groups=4)
config = config.set_override_name("lossless_autoencoder_bbv2_shallow_c32_r4_none")
