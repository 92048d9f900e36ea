"""ANS module entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/ans.py
(ANSEntropyCoder over torch_quant, entropy_coder/ans.py:14-158). The repo's
QuantizedTensorCodec IS the quantize→native-rANS bridge (adaptive per-channel
histogram prior = the reference's default prob-table path)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.quantized_coder import QuantizedTensorCodec

config = ClassBuilder(
    QuantizedTensorCodec,
    prior=ParamSlot("prior", default="adaptive",
                    choices={"adaptive": "adaptive", "uniform": "uniform"}),
).add_all_kwargs_as_param_slot().set_override_name("ans")
