"""Codec sub-config: zstd wrapper with trained dictionary (32 KiB).

Parity: reference configs/codecs/zstd_wrapper/dict.py over
ZstdDictWrapperCodec (dict_size slot, default 32 KiB)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import ZstdDictCodec

config = ClassBuilder(
    ZstdDictCodec,
    levels=ParamSlot("levels", default=(3,)),
    dict_size=ParamSlot("dict_size", default=32 * 1024),
    train_dataloader=ParamSlot("train_dataloader", default=None),
).set_override_name("zstd_wrapper_dict")
