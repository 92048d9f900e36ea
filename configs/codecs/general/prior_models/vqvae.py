"""VQ-VAE prior-model sub-config (EMA codebook).

Parity: reference configs/codecs/general/prior_models/vqvae.py
(VQVAE prior model, nn/models/vqvae.py). Maps to VQVAECodec over the
repo VQVAE with the EMA quantizer."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
from cbench_basic_tpu.nn.models import VQVAE


def _build(hidden=128, dim=64, num_codes=512, quantizer="ema"):
    return VQVAECodec(VQVAE(hidden=hidden, dim=dim, num_codes=num_codes,
                            quantizer=quantizer))


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
    num_codes=ParamSlot("num_codes", default=512),
    quantizer=ParamSlot("quantizer", default="ema",
                        choices={"ema": "ema", "gssoft": "gssoft",
                                 "pyramid": "pyramid", "multi": "multi"}),
).set_override_name("vqvae")
