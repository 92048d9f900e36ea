"""Codec sub-config: zstd with a trained dictionary (self-trainable).

Parity: reference configs/codecs/pycodecs/zstd_dict.py — train_dataloader
slot feeds SelfTrainableInterface dictionary training before testing."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import ZstdDictCodec

config = ClassBuilder(
    ZstdDictCodec,
    levels=ParamSlot("levels", default=(3, 19)),
    dict_size=ParamSlot("dict_size", default=32 * 1024),
    train_dataloader=ParamSlot("train_dataloader", default=None),
).set_override_name("zstd_dict")
