"""Codec sub-config: trained LZ77 dictionary + grouped sequence coding.

Parity: reference configs/codecs/zstd_wrapper/dict_lz77seq.py
(dictionary-primed sequence extraction): the LZ77 tokenizer matches
against a trained dictionary prefix; sequences code through grouped
tANS."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fse_codecs import GroupedLZ77EntropyCodec
from cbench_basic_tpu.codecs.lz77 import LZ77Codec


def _build(table_log=11, dictionary=b""):
    return LZ77Codec(inner=GroupedLZ77EntropyCodec(table_log=table_log),
                     dictionary=dictionary)


config = ClassBuilder(
    _build,
    table_log=ParamSlot("table_log", default=11),
    dictionary=ParamSlot("dictionary", default=b""),
).set_override_name("zstd_dict_lz77seq")
