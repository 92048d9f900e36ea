"""Sub-config: slimmable PGM edge builders (inter-node BayesNet width
selectors; parity: reference pgm_layers one-hot selector configs)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableAnalysisTransform,
)


def _build(widths=DEFAULT_WIDTHS, m=192):
    widths = tuple(widths)
    return PGMSlimmableEdge(SlimmableAnalysisTransform(widths, m),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    m=ParamSlot("M", default=192),
).set_override_name("slimmable_analysis_edge")
