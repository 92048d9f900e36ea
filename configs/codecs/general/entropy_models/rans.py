"""Legacy rANS byte entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/rans.py
(RansEntropyCoder, entropy_coder/rans.py:72-194 — the CompressAI-style
`cbench.rans` backend). Maps to RansByteCodec over the repo's
BufferedRansEncoder/Decoder pair (bit-compatible with the reference's
legacy module, see tests/test_module_golden.py case m8)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.entropy_codecs import RansByteCodec

config = ClassBuilder(
    RansByteCodec,
).add_all_kwargs_as_param_slot().set_override_name("rans")
