"""FSE-only codec preset (parity: reference
configs/codecs/general/presets/fse_only.py — GeneralCodec with just the
byte-level tANS entropy stage, no preprocessor)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config.import_utils import import_config_from_file

_G = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

config = import_config_from_file(os.path.join(_G, "base.py")) \
    .update_slot_params(
        inner=import_config_from_file(
            os.path.join(_G, "entropy_models", "basic_fse.py")),
    ).set_override_name("fse_only")
