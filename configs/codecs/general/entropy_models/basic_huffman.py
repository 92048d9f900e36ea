"""Canonical-Huffman byte entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/basic_huffman.py
(HuffmanEntropyCoder, entropy_coder/huffman.py). Maps to HuffmanCodec."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.entropy_codecs import HuffmanCodec

config = ClassBuilder(
    HuffmanCodec,
).add_all_kwargs_as_param_slot().set_override_name("basic_huffman")
