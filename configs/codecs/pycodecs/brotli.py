"""Codec sub-config: brotli byte codec (module not baked into this image; errors at first use, config surface stays importable).

Parity: reference configs/codecs/pycodecs/brotli.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import BrotliCodec

config = ClassBuilder(
    BrotliCodec,
    levels=ParamSlot("levels", default=(5, 9, 11)),
).set_override_name("brotli")
