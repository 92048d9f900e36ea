"""Codec sub-config: pure-python zlib codec.

Parity: reference configs/codecs/py_zlib.py over PyZlibCodec."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import ZlibCodec

config = ClassBuilder(
    ZlibCodec,
    levels=ParamSlot("levels", default=(6,)),
).set_override_name("py_zlib")
