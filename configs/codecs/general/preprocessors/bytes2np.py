"""Bytes→numpy preprocessor sub-config.

Parity: reference configs/codecs/general/preprocessors/bytes2np.py
(Bytes2NumpyPreprocessor, preprocessor/bytes2np.py:13). Maps to
Bytes2ArrayPreprocessor."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.general_codec import Bytes2ArrayPreprocessor

config = ClassBuilder(
    Bytes2ArrayPreprocessor,
).add_all_kwargs_as_param_slot().set_override_name("bytes2np")
