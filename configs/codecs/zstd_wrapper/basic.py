"""Codec sub-config: plain zstd wrapper.

Parity: reference configs/codecs/zstd_wrapper/basic.py over
ZstdWrapperCodec."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import ZstdCodec

config = ClassBuilder(
    ZstdCodec,
    levels=ParamSlot("levels", default=(3,)),
).set_override_name("zstd_basic")
