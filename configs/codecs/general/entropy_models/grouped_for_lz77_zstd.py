"""Grouped zstd-style sequence coder for LZ77 token streams.

Parity: reference configs/codecs/general/entropy_models/grouped_for_lz77_zstd.py
(GroupedEntropyCoder over per-substream TANSEntropyCoders with the zstd
ll/ml/offset bucket tables). Maps to GroupedLZ77EntropyCodec, which codes
literal / literal-run / match-length / offset substreams with separate
native tANS tables and packs bucket extra bits raw."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fse_codecs import GroupedLZ77EntropyCodec

config = ClassBuilder(
    GroupedLZ77EntropyCodec,
    table_log=ParamSlot("table_log", default=11),
).set_override_name("grouped_for_lz77_zstd")
