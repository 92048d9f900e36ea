"""GroupedVariableRateCodec sub-config.

Parity: reference configs/codecs/general/grouped_variable_rate.py
(GroupedVariableRateCodec, codecs/base.py:138 — list of per-λ codecs
exposed as one variable-rate codec)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.base import GroupedVariableRateCodec

config = ClassBuilder(
    GroupedVariableRateCodec,
    codecs=ParamSlot("codecs"),
).set_override_name("grouped_variable_rate")
