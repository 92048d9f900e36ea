"""LZ77 preprocessor sub-config.

Parity: reference configs/codecs/general/preprocessors/lz77.py
(LZ77Preprocessor, preprocessor/lz77.py:63-143). Tokenizes the input so a
downstream grouped entropy coder codes the token stream."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.lz77 import LZ77Preprocessor

config = ClassBuilder(
    LZ77Preprocessor,
    max_chain=ParamSlot("max_chain", default=16),
).set_override_name("lz77")
