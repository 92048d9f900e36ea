"""LZ77-with-trained-dictionary preprocessor sub-config.

Parity: reference configs/codecs/general/preprocessors/lz77_dict.py
(LZ77 preprocessor with a trained shared dictionary,
preprocessor/lz77_dict_training.py). The dictionary is fit by
LZ77Preprocessor.train_full (fastcover-style trainer,
codecs/lz77.py train_lz77_dictionary)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lz77 import LZ77Preprocessor

config = ClassBuilder(
    LZ77Preprocessor,
    dictionary=ParamSlot("dictionary", default=b""),
    max_chain=ParamSlot("max_chain", default=16),
).set_override_name("lz77_dict")
