"""Quantized-tensor entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/torch_quant.py
(TorchQuantizedEntropyCoder, entropy_coder/torch_base.py:9-78 — data_range/
data_precision quantization with prior formats). Maps to the repo's
QuantizedTensorCodec, whose header-validated prior modes cover the same
uniform/adaptive/prob/logit surface."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.quantized_coder import QuantizedTensorCodec

config = ClassBuilder(
    QuantizedTensorCodec,
    data_range=ParamSlot("data_range", default=(0.0, 1.0)),
    precision=ParamSlot("precision", default=8),
).add_all_kwargs_as_param_slot().set_override_name("torch_quant")
