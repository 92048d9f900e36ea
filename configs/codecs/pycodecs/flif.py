"""Codec sub-config: FLIF lossless image codec via external binaries.

Parity: reference configs/codecs/pycodecs/flif.py — the flif binary is
not in this image; the wrapper raises FileNotFoundError at build unless
`flif` is on PATH (same contract as the other external codecs)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.binary_codec import ExternalBinaryCodec


def _build(encoder="flif", decoder="flif"):
    return ExternalBinaryCodec(
        encode_cmd=[encoder, "-e", "--overwrite", "{input}", "{output}"],
        decode_cmd=[decoder, "-d", "--overwrite", "{input}", "{output}"],
        compressed_suffix=".flif")


config = ClassBuilder(
    _build,
    encoder=ParamSlot("encoder", default="flif"),
    decoder=ParamSlot("decoder", default="flif"),
).set_override_name("flif")
