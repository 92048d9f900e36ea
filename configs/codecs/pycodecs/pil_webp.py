"""Codec sub-config: PIL WEBP (variable-quality WebP).

Parity: reference configs/codecs/pycodecs/pil_webp.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.pycodecs import PILImageCodec


def _build(qualities=(10, 25, 50, 75, 90)):
    return PILImageCodec("WEBP", qualities=list(qualities))


config = ClassBuilder(
    _build,
    qualities=ParamSlot("qualities", default=(10, 25, 50, 75, 90)),
).set_override_name("pil_webp")
