"""Codec interfaces.

Parity: reference cbench/codecs/base.py:10-243 — CodecInterface
(compress/decompress/update_state), the variable-rate / variable-complexity /
variable-task interfaces, and GroupedVariableRateCodec (N per-λ codecs
exposed as one variable-rate codec).
"""

from __future__ import annotations

from typing import Any, Dict, List


class CodecInterface:
    def compress(self, data) -> bytes:
        raise NotImplementedError

    def decompress(self, data: bytes):
        raise NotImplementedError

    def update_state(self, *args, **kwargs) -> None:
        """Build coding tables (CDFs etc.) after training / loading."""
        return None


class SelfTrainableInterface:
    """A module that owns its training procedure.

    Parity: the reference's SelfTrainableModule / SelfTrainableInterface
    (cbench/modules/base.py) — trainables carry a `trainer` engine and the
    benchmark asks them to train themselves instead of wiring a loop.
    Anything with a `trainer` attribute and parameters qualifies; the
    default train_self() delegates to trainer.train_module(self).
    """

    trainer = None

    @property
    def is_trainable(self) -> bool:
        return self.trainer is not None

    def get_trainer(self):
        return self.trainer

    def set_trainer(self, trainer) -> None:
        self.trainer = trainer

    def train_self(self) -> Dict[str, Any]:
        """Run this module's own training. No-op without a trainer."""
        if self.trainer is None:
            return {}
        return self.trainer.train_module(self)


class VariableRateCodecInterface:
    @property
    def num_rate_levels(self) -> int:
        return 1

    def set_rate_level(self, level: int, *args, **kwargs) -> None:
        return None


class VariableComplexityCodecInterface:
    @property
    def num_complex_levels(self) -> int:
        return 1

    def set_complex_level(self, level: int, *args, **kwargs) -> None:
        return None

    def get_current_complex_metrics(self) -> Dict[str, Any]:
        return {}


class VariableTaskCodecInterface:
    @property
    def num_tasks(self) -> int:
        return 1

    def set_task(self, task_idx: int, *args, **kwargs) -> None:
        return None


class GroupedVariableRateCodec(CodecInterface, SelfTrainableInterface,
                               VariableRateCodecInterface,
                               VariableComplexityCodecInterface,
                               VariableTaskCodecInterface):
    """A list of codecs (e.g. one per training λ) exposed as a single
    variable-rate codec; rate level selects (codec, sub-level).

    Parity: reference codecs/base.py:138-243.
    """

    def __init__(self, codecs: List[CodecInterface], trainer=None, **kwargs):
        self.codecs = codecs
        self.trainer = trainer
        self._current = 0
        self._sub_level = 0

    @property
    def _rate_level_map(self):
        out = []
        for ci, c in enumerate(self.codecs):
            n = c.num_rate_levels if isinstance(c, VariableRateCodecInterface) else 1
            out.extend((ci, sub) for sub in range(n))
        return out

    @property
    def num_rate_levels(self) -> int:
        return len(self._rate_level_map)

    def set_rate_level(self, level: int, *args, **kwargs) -> None:
        ci, sub = self._rate_level_map[level]
        self._current = ci
        self._sub_level = sub
        codec = self.codecs[ci]
        if isinstance(codec, VariableRateCodecInterface):
            codec.set_rate_level(sub)

    @property
    def active_codec(self) -> CodecInterface:
        return self.codecs[self._current]

    @property
    def num_complex_levels(self) -> int:
        c = self.active_codec
        return c.num_complex_levels if isinstance(c, VariableComplexityCodecInterface) else 1

    def set_complex_level(self, level: int, *args, **kwargs) -> None:
        for c in self.codecs:
            if isinstance(c, VariableComplexityCodecInterface):
                c.set_complex_level(level)

    def get_current_complex_metrics(self) -> Dict[str, Any]:
        c = self.active_codec
        if isinstance(c, VariableComplexityCodecInterface):
            return c.get_current_complex_metrics()
        return {}

    def compress(self, data) -> bytes:
        return self.active_codec.compress(data)

    def decompress(self, data: bytes):
        return self.active_codec.decompress(data)

    def update_state(self, *args, **kwargs) -> None:
        for c in self.codecs:
            c.update_state(*args, **kwargs)
