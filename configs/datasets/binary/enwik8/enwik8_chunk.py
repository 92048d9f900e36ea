"""Dataset sub-config: enwik8 served in fixed-length chunks.

Parity: reference configs/datasets/binary/enwik8/enwik8_chunk.py
(segment_length=16 KiB slot over the base enwik8 config).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", "..", ".."))

from cbench_basic_tpu.config.import_utils import import_config_from_file

config = import_config_from_file(os.path.join(_HERE, "enwik8.py")).clone(
    copy_slot_data=True)
config.update_slot_params(chunk_size=16 * 1024, size=16 * 1024)
config = config.set_override_name("enwik8_chunk")
