"""Codec sub-config: zstd-style LZ77 sequence extraction + grouped tANS
sequence coding (literals / lit-lengths / match-lengths / offsets).

Parity: reference configs/codecs/zstd_wrapper/lz77seq.py
(ZstdWrapperCodec use_sequences=True) — here the repo's LZ77 tokenizer
feeding GroupedLZ77EntropyCodec (codecs/fse_codecs.py:147)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fse_codecs import GroupedLZ77EntropyCodec
from cbench_basic_tpu.codecs.lz77 import LZ77Codec


def _build(table_log=11):
    return LZ77Codec(inner=GroupedLZ77EntropyCodec(table_log=table_log))


config = ClassBuilder(
    _build,
    table_log=ParamSlot("table_log", default=11),
).set_override_name("zstd_lz77seq")
