"""GeneralCodec: the preprocessor → model → entropy-coding composition.

Parity: reference cbench/codecs/general_codec.py:18-375 — THE composition
codec chaining Preprocessor / PriorModel / ContextModel / EntropyCoder with
per-stage profiling and bitstream merging, delegating variable-rate /
complexity / task levels to submodules.

In this framework the NIC pipeline (prior model + context model + entropy
coder) is realized by LatentGraphCodec / NeuralImageCodec; GeneralCodec
composes an optional preprocessing stage (e.g. the 3-way AR image
predictor, bytes<->array adapters, classical residual coders) around any
inner CodecInterface.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..utils.bytes_ops import merge_bytes, split_merged_bytes
from ..utils.logging_utils import MetricLogger
from .base import (
    CodecInterface,
    VariableComplexityCodecInterface,
    VariableRateCodecInterface,
    VariableTaskCodecInterface,
)


class Preprocessor:
    """Invertible preprocessing stage (parity:
    cbench/modules/preprocessor/base.py): preprocess may emit side-info
    bytes required by postprocess."""

    def preprocess(self, data):
        """Returns (transformed_data, side_info_bytes)."""
        return data, b""

    def postprocess(self, data, side_info: bytes = b""):
        return data


class Bytes2ArrayPreprocessor(Preprocessor):
    """bytes <-> uint8 array adapter (parity: preprocessor/bytes2np.py:13)."""

    def preprocess(self, data):
        if isinstance(data, (bytes, bytearray)):
            return np.frombuffer(bytes(data), np.uint8), b""
        return np.asarray(data), b""

    def postprocess(self, data, side_info: bytes = b""):
        return np.asarray(data, np.uint8).tobytes()


class ThreeWayARImagePredictor(Preprocessor):
    """3-way autoregressive image predictor (parity:
    preprocessor/image_predictor.py:15-43 over the cbench.ar transforms):
    residual = pixel - mean(left, top, top-left), inverted sequentially."""

    def __init__(self, offsets=None, modulus: int = 256):
        from ..coding.ar_transforms import THREE_WAY_IMAGE_OFFSETS
        self.offsets = offsets or THREE_WAY_IMAGE_OFFSETS
        self.modulus = modulus

    def preprocess(self, data):
        from ..coding.ar_transforms import ar_mean_forward
        img = np.asarray(data)
        # Batch-dim convention of the AR ops: (1, H, W[, C]).
        res = ar_mean_forward(img[None], self.offsets, self.modulus)[0]
        return res.astype(np.uint8) if self.modulus == 256 else res, b""

    def postprocess(self, data, side_info: bytes = b""):
        from ..coding.ar_transforms import ar_mean_inverse
        rec = ar_mean_inverse(np.asarray(data)[None], self.offsets,
                              self.modulus)[0]
        return rec.astype(np.uint8) if self.modulus == 256 else rec


class GeneralCodec(CodecInterface, VariableRateCodecInterface,
                   VariableComplexityCodecInterface, VariableTaskCodecInterface):
    """preprocessor -> inner codec pipeline with per-stage profiling."""

    def __init__(self, inner: CodecInterface,
                 preprocessor: Optional[Preprocessor] = None):
        self.inner = inner
        self.preprocessor = preprocessor
        self.profiler = MetricLogger()

    def compress(self, data) -> bytes:
        side = b""
        if self.preprocessor is not None:
            with self.profiler.start_time_profile("time_preprocess"):
                data, side = self.preprocessor.preprocess(data)
        with self.profiler.start_time_profile("time_inner_compress"):
            payload = self.inner.compress(data)
        return merge_bytes([side, payload], num_segments=2)

    def decompress(self, data: bytes):
        side, payload = split_merged_bytes(data, num_segments=2)
        with self.profiler.start_time_profile("time_inner_decompress"):
            out = self.inner.decompress(payload)
        if self.preprocessor is not None:
            with self.profiler.start_time_profile("time_postprocess"):
                out = self.preprocessor.postprocess(out, side)
        return out

    def update_state(self, *args, **kwargs):
        self.inner.update_state(*args, **kwargs)

    # -- delegation of variable-rate/complexity/task --------------------------
    @property
    def num_rate_levels(self):
        return getattr(self.inner, "num_rate_levels", 1)

    def set_rate_level(self, level, *a, **k):
        if isinstance(self.inner, VariableRateCodecInterface):
            self.inner.set_rate_level(level, *a, **k)

    @property
    def num_complex_levels(self):
        return getattr(self.inner, "num_complex_levels", 1)

    def set_complex_level(self, level, *a, **k):
        if isinstance(self.inner, VariableComplexityCodecInterface):
            self.inner.set_complex_level(level, *a, **k)

    def get_current_complex_metrics(self) -> Dict[str, Any]:
        if isinstance(self.inner, VariableComplexityCodecInterface):
            return self.inner.get_current_complex_metrics()
        return {}

    @property
    def num_tasks(self):
        return getattr(self.inner, "num_tasks", 1)

    def set_task(self, task_idx, *a, **k):
        if isinstance(self.inner, VariableTaskCodecInterface):
            self.inner.set_task(task_idx, *a, **k)
