"""FSE/tANS byte entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/basic_fse.py
(FSEEntropyCoder, entropy_coder/fse.py). Maps to TansByteCodec — one
native tANS table over the byte alphabet."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fse_codecs import TansByteCodec

config = ClassBuilder(
    TansByteCodec,
    table_log=ParamSlot("table_log", default=11),
).set_override_name("basic_fse")
