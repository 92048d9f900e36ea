"""Codec sub-config: pickle serialization codec.

Parity: reference configs/codecs/pickle.py over PickleCodec."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lossless import PickleCodec

config = ClassBuilder(PickleCodec).set_override_name("pickle")
