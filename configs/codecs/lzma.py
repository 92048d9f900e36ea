"""Sub-config: lzma lossless byte codec."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.codecs.lossless import LzmaCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot

config = ClassBuilder(
    LzmaCodec,
    levels=ParamSlot("levels", default=None),
).set_override_name("lzma")
