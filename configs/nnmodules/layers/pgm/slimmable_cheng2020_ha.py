"""PGM edge: slimmable-width Cheng2020 hyper analysis (3x3 stack).

Parity: reference configs/nnmodules/layers/pgm/slimmable_cheng2020_ha.py over
Cheng2020HyperAnalysisSlimmableConv2dPGMModel (pgm_layers.py:1136)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import Cheng2020HyperAnalysisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, N=192, M=192):
    widths = tuple(widths)
    return PGMSlimmableEdge(Cheng2020HyperAnalysisTransform(widths, N=N, M=M),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    N=ParamSlot("N", default=192),
    M=ParamSlot("M", default=192),
).set_override_name("slimmable_cheng2020_ha")
