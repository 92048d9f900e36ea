"""Codec sub-config: zlib byte codec with level slots.

Parity: reference configs/codecs/pycodecs/zlib.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import ZlibCodec

config = ClassBuilder(
    ZlibCodec,
    levels=ParamSlot("levels", default=(1, 6, 9)),
).set_override_name("zlib")
