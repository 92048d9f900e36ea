"""Layer sub-config: VQ-VAE encoder stack (reference vqvae model encoder).

Parity: reference configs/nnmodules/layers/vqvae_encoder.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.vqvae import VQVAEEncoder

config = ClassBuilder(
    VQVAEEncoder,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
).set_override_name("vqvae_encoder")
