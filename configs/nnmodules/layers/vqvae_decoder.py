"""Layer sub-config: VQ-VAE decoder stack (reference vqvae model decoder).

Parity: reference configs/nnmodules/layers/vqvae_decoder.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.vqvae import VQVAEDecoder

config = ClassBuilder(
    VQVAEDecoder,
    hidden=ParamSlot("hidden", default=128),
    out_channels=ParamSlot("out_channels", default=3),
).set_override_name("vqvae_decoder")
