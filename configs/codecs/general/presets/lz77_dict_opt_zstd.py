"""LZ77 + trained dictionary + deeper match search preset (parity:
reference presets/lz77_dict_opt_zstd.py — the 'optimal parse' variant;
here the deeper hash-chain search, max_chain=64)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config.import_utils import import_config_from_file

config = import_config_from_file(
    os.path.join(os.path.dirname(__file__), "lz77_dict_zstd.py")) \
    .update_slot_params(max_chain=64) \
    .set_override_name("lz77_dict_opt_zstd")
