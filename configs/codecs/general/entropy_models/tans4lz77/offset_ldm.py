"""Long-distance-matching offset coder (parity: reference
tans4lz77/offset_ldm.py — 27-bit offset buckets for LDM windows)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

import numpy as np

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.table_code import TableCodeCodec

config = ClassBuilder(
    TableCodeCodec,
    coding_table=np.zeros(1, np.int64),
    extra_symbols=(1 << np.arange(28)).astype(np.int64),
).set_override_name("tans4lz77_offset_ldm")
