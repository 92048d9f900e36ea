"""Per-substream tANS coder base (parity: reference entropy_models/
tans4lz77/basic.py — TANSEntropyCoder with per-stream coding tables).
Maps to TableCodeCodec: bucket coding table + extra-bit symbols + rANS
over codes, the same decomposition the reference expresses with
coding_table/coding_extra_symbols."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.table_code import TableCodeCodec

config = ClassBuilder(
    TableCodeCodec,
    max_symbol=ParamSlot("max_symbol", default=255),
    max_bits=ParamSlot("max_bits", default=31),
).set_override_name("tans4lz77_basic")
