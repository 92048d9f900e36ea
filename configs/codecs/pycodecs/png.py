"""Codec sub-config: PIL PNG (lossless PNG (imageio in the reference; PIL here)).

Parity: reference configs/codecs/pycodecs/png.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.pycodecs import PILImageCodec


def _build(qualities=(None,)):
    return PILImageCodec("PNG", qualities=list(qualities))


config = ClassBuilder(
    _build,
    qualities=ParamSlot("qualities", default=(None,)),
).set_override_name("png")
