"""LZ77 + single tANS codec config.

Parity: reference configs/codecs/general/lz77_tans.py (LZ77 preprocessor +
tANS token coder)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_config_from_file

_HERE = os.path.dirname(__file__)

config = import_config_from_file(os.path.join(_HERE, "base.py")) \
    .update_slot_params(
        preprocessor=import_config_from_file(
            os.path.join(_HERE, "preprocessors", "lz77.py")),
        inner=import_config_from_file(
            os.path.join(_HERE, "entropy_models", "basic_fse.py")),
    ).set_override_name("lz77_tans")
