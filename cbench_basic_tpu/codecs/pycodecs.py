"""Classical image codec baselines via PIL.

Parity: reference cbench/codecs/pycodecs.py:178-257 (PNG/WebP/JPEG wrappers
with quality levels as variable-rate levels). These validate the benchmark
harness end-to-end and anchor compression-ratio sanity checks.
"""

from __future__ import annotations

import io

import numpy as np

from .base import CodecInterface, VariableRateCodecInterface


class PILImageCodec(CodecInterface, VariableRateCodecInterface):
    """Lossless-or-lossy image codec through PIL (PNG, WEBP, JPEG...)."""

    def __init__(self, format: str = "PNG", qualities=None, **save_kwargs):
        self.format = format.upper()
        self.qualities = list(qualities) if qualities else None
        self._quality_idx = 0
        self.save_kwargs = save_kwargs

    @property
    def num_rate_levels(self) -> int:
        return len(self.qualities) if self.qualities else 1

    def set_rate_level(self, level: int, *args, **kwargs) -> None:
        self._quality_idx = level

    def compress(self, data) -> bytes:
        from PIL import Image
        img = Image.fromarray(np.asarray(data))
        buf = io.BytesIO()
        kwargs = dict(self.save_kwargs)
        if self.qualities:
            kwargs["quality"] = self.qualities[self._quality_idx]
        img.save(buf, format=self.format, **kwargs)
        return buf.getvalue()

    def decompress(self, data: bytes) -> np.ndarray:
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
