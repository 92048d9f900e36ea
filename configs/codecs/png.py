"""Sub-config: PIL PNG baseline codec."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.codecs.pycodecs import PILImageCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot

config = ClassBuilder(
    PILImageCodec,
    format="PNG",
    qualities=ParamSlot("qualities", default=None),
).set_override_name("png")
