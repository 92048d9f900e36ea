"""Codec sub-config: LZ77 sequence coding on the NATIVE tANS backend.

Parity: reference configs/codecs/zstd_wrapper/lz77seq_c.py (the C
sequence-coding path) — the repo's tANS tables are always the native
C++ coder (coding/csrc/tanscoder.cpp); this config pins the larger
table_log the native path uses."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fse_codecs import GroupedLZ77EntropyCodec
from cbench_basic_tpu.codecs.lz77 import LZ77Codec


def _build(table_log=12):
    return LZ77Codec(inner=GroupedLZ77EntropyCodec(table_log=table_log))


config = ClassBuilder(
    _build,
    table_log=ParamSlot("table_log", default=12),
).set_override_name("zstd_lz77seq_c")
