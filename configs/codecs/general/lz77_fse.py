"""LZ77 + per-substream FSE codec config.

Parity: reference configs/codecs/general/lz77_fse.py (GeneralCodec with
LZ77 preprocessor + GroupedEntropyCoder of FSEEntropyCoders). Maps to
GeneralCodec(LZ77Preprocessor → GroupedLZ77EntropyCodec)."""

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
            os.path.join(_HERE, "entropy_models", "grouped_for_lz77_zstd.py")),
    ).set_override_name("lz77_fse")
