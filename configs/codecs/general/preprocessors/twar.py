"""Three-way AR image-predictor preprocessor sub-config.

Parity: reference configs/codecs/general/preprocessors/twar.py
(3-way AR predictor using cbench.ar, preprocessor/image_predictor.py:15-43).
Maps to ThreeWayARImagePredictor (native ar_mean transform)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.general_codec import ThreeWayARImagePredictor

config = ClassBuilder(
    ThreeWayARImagePredictor,
).add_all_kwargs_as_param_slot().set_override_name("twar")
