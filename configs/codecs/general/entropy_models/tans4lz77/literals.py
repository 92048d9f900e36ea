"""Literal-byte substream coder (parity: reference tans4lz77/literals.py —
identity coding table over the byte alphabet, no extra bits)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

import numpy as np

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.table_code import TableCodeCodec

config = ClassBuilder(
    TableCodeCodec,
    coding_table=np.arange(256),
    extra_symbols=np.ones(256, np.int64),
).set_override_name("tans4lz77_literals")
