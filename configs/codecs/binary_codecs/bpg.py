"""Codec sub-config: BPG via external bpgenc/bpgdec binaries.

Parity: reference configs/codecs/binary_codecs/bpg.py (encoder/decoder
paths from env). Binaries are absent in this image; the wrapper raises
FileNotFoundError at build unless they are on PATH."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.binary_codec import ExternalBinaryCodec


def _build(encoder="bpgenc", decoder="bpgdec",
           qualities=(51, 42, 37, 32, 27)):
    return ExternalBinaryCodec(
        encode_cmd=[encoder, "-q", "{quality}", "-o", "{output}", "{input}"],
        decode_cmd=[decoder, "-o", "{output}", "{input}"],
        qualities=list(qualities), compressed_suffix=".bpg")


config = ClassBuilder(
    _build,
    encoder=ParamSlot("encoder", default="bpgenc"),
    decoder=ParamSlot("decoder", default="bpgdec"),
    qualities=ParamSlot("qualities", default=(51, 42, 37, 32, 27)),
).set_override_name("bpg")
