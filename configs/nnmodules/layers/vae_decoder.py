"""Layer sub-config: VAE decoder stack (reference vae module decoder).

Parity: reference configs/nnmodules/layers/vae_decoder.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.vae import VAEDecoder

config = ClassBuilder(
    VAEDecoder,
    out_channels=ParamSlot("out_channels", default=3),
    hidden=ParamSlot("hidden", default=(128, 64, 32)),
).set_override_name("vae_decoder")
