"""PGM edge: slimmable-width mean-scale hyper analysis (leaky-relu h_a).

Parity: reference configs/nnmodules/layers/pgm/slimmable_hyperprior_ms_ha.py over
MeanScaleHyperpriorHyperAnalysisSlimmableConv2dPGMModel (pgm_layers.py:1054)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableHyperAnalysisTransform,
)


def _build(widths=DEFAULT_WIDTHS, N=192, M=384):
    widths = tuple(widths)
    return PGMSlimmableEdge(SlimmableHyperAnalysisTransform(widths, N=N, M=M),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    N=ParamSlot("N", default=192),
    M=ParamSlot("M", default=384),
).set_override_name("slimmable_hyperprior_ms_ha")
