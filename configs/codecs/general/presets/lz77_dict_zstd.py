"""LZ77 + trained dictionary + zstd-style grouped coding preset (parity:
reference presets/lz77_dict_zstd.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config.import_utils import import_config_from_file

_G = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

config = import_config_from_file(os.path.join(_G, "base.py")) \
    .update_slot_params(
        preprocessor=import_config_from_file(
            os.path.join(_G, "preprocessors", "lz77_dict.py")),
        inner=import_config_from_file(
            os.path.join(_G, "entropy_models",
                         "grouped_predcnt_for_lz77_zstd.py")),
    ).set_override_name("lz77_dict_zstd")
