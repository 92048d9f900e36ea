"""PGM edge: base builder wrapping ANY transform object in a
PGMSlimmableEdge (learned categorical over complexity levels).

Parity: reference configs/nnmodules/layers/pgm/base.py over
BasePGMLayer (pgm_layers.py)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableAnalysisTransform,
)


def _build(transform=None, num_levels=len(DEFAULT_WIDTHS)):
    if transform is None:
        transform = SlimmableAnalysisTransform(DEFAULT_WIDTHS, 192)
    return PGMSlimmableEdge(transform, num_levels=num_levels)


config = ClassBuilder(
    _build,
    transform=ParamSlot("transform", default=None),
    num_levels=ParamSlot("levels", default=len(DEFAULT_WIDTHS)),
).set_override_name("pgm_base")
