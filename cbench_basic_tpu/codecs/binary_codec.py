"""External-binary image codecs via subprocess.

Parity: reference cbench/codecs/binary_codec.py:280-778 (BPG / JPEG2000 /
TFCI / VTM / HM / AV1 wrappers). Binaries are absent from this image, so
instances raise a clear error at construction unless the executables exist;
command templates match the reference's invocation patterns.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

from .base import CodecInterface, VariableRateCodecInterface


class ExternalBinaryCodec(CodecInterface, VariableRateCodecInterface):
    """Generic wrapper: encode/decode by shelling out to executables.

    Templates use {input}, {output}, {quality} placeholders. The image is
    round-tripped through PNG files in a temp dir.
    """

    def __init__(self, encode_cmd: Sequence[str], decode_cmd: Sequence[str],
                 qualities: Optional[List] = None,
                 compressed_suffix: str = ".bin"):
        self.encode_cmd = list(encode_cmd)
        self.decode_cmd = list(decode_cmd)
        self.qualities = qualities or [None]
        self._quality_idx = len(self.qualities) - 1
        self.compressed_suffix = compressed_suffix
        exe = self.encode_cmd[0]
        if shutil.which(exe) is None:
            raise FileNotFoundError(
                f"external codec binary {exe!r} not found on PATH")

    @property
    def num_rate_levels(self):
        return len(self.qualities)

    def set_rate_level(self, level, *a, **k):
        self._quality_idx = level

    def _fmt(self, cmd, **kw):
        return [c.format(**kw) for c in cmd]

    def compress(self, data) -> bytes:
        from PIL import Image
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.png")
            dst = os.path.join(td, "out" + self.compressed_suffix)
            Image.fromarray(np.asarray(data)).save(src)
            cmd = self._fmt(self.encode_cmd, input=src, output=dst,
                            quality=self.qualities[self._quality_idx])
            subprocess.run(cmd, check=True, capture_output=True)
            with open(dst, "rb") as f:
                return f.read()

    def decompress(self, data: bytes):
        from PIL import Image
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in" + self.compressed_suffix)
            dst = os.path.join(td, "out.png")
            with open(src, "wb") as f:
                f.write(data)
            cmd = self._fmt(self.decode_cmd, input=src, output=dst)
            subprocess.run(cmd, check=True, capture_output=True)
            return np.asarray(Image.open(dst).convert("RGB"))


def bpg_codec(qualities=(28, 32, 36, 40)) -> ExternalBinaryCodec:
    """BPG (reference binary_codec.py:320): bpgenc -q / bpgdec."""
    return ExternalBinaryCodec(
        ["bpgenc", "-q", "{quality}", "-o", "{output}", "{input}"],
        ["bpgdec", "-o", "{output}", "{input}"],
        qualities=list(qualities), compressed_suffix=".bpg")


def jpeg2000_codec(rates=(0.25, 0.5, 1.0)) -> ExternalBinaryCodec:
    """OpenJPEG (reference binary_codec.py:280 glymur analog)."""
    return ExternalBinaryCodec(
        ["opj_compress", "-i", "{input}", "-o", "{output}", "-r", "{quality}"],
        ["opj_decompress", "-i", "{input}", "-o", "{output}"],
        qualities=list(rates), compressed_suffix=".j2k")
