"""PGM edge: slimmable-width hyperprior analysis (g_a).

Parity: reference configs/nnmodules/layers/pgm/slimmable_hyperprior_a.py over
HyperpriorAnalysisSlimmableConv2dPGMModel (pgm_layers.py:904)."""

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


def _build(widths=DEFAULT_WIDTHS, M=192):
    widths = tuple(widths)
    return PGMSlimmableEdge(SlimmableAnalysisTransform(widths, M=M),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
).set_override_name("slimmable_hyperprior_a")
