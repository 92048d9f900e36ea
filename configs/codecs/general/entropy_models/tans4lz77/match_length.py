"""Match-length substream coder (parity: reference
tans4lz77/match_length.py — zstd ml bucket table)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.table_code import TableCodeCodec

config = ClassBuilder(
    TableCodeCodec,
    max_symbol=512,
    max_bits=16,
).set_override_name("tans4lz77_match_length")
