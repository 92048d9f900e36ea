"""Pyramid-VQ v2 prior model (multi-scale residual codebooks).

Parity: reference configs/codecs/general/prior_models/vqvae_pvq_v2.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
from cbench_basic_tpu.nn.models import VQVAE


def _build(hidden=128, dim=64, num_codes=512):
    return VQVAECodec(VQVAE(hidden=hidden, dim=dim, num_codes=num_codes,
                            quantizer="pyramid"))


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
    num_codes=ParamSlot("num_codes", default=512),
).set_override_name("vqvae_pvq_v2")
