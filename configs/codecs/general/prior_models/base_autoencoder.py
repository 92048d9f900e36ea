"""Autoencoder prior-model composition base sub-config (slot-only).

Parity: reference configs/codecs/general/prior_models/base_autoencoder.py
(AutoEncoderPriorModel base with model/prior_coder slots,
prior_model/autoencoder.py:22). The repo's analog wraps a trained flax
model in NeuralImageCodec; `model` and `params` are mandatory slots."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.neural import NeuralImageCodec

config = ClassBuilder(
    NeuralImageCodec,
    model=ParamSlot("model"),
    params=ParamSlot("params", default=None),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("base_autoencoder")
