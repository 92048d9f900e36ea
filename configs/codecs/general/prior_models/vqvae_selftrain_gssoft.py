"""Gumbel-softmax VQ-VAE prior-model sub-config.

Parity: reference configs/codecs/general/prior_models/
vqvae_selftrain_gssoft.py (GSSoft quantizer variant, vqvae.py
VQEmbeddingGSSoft). Same codec as vqvae.py with quantizer="gssoft"."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config.import_utils import import_config_from_file

config = import_config_from_file(
    os.path.join(os.path.dirname(__file__), "vqvae.py")
).update_slot_params(quantizer="gssoft") \
 .set_override_name("vqvae_selftrain_gssoft")
