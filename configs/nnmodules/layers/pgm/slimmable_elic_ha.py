"""PGM edge: slimmable-width ELIC hyper analysis.

Parity: reference configs/nnmodules/layers/pgm/slimmable_elic_ha.py over
ELICHyperAnalysisSlimmableConv2dPGMModel (pgm_layers.py:1248)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import ELICHyperAnalysisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, N=192, M=192):
    widths = tuple(widths)
    return PGMSlimmableEdge(ELICHyperAnalysisTransform(widths, N=N, M=M),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    N=ParamSlot("N", default=192),
    M=ParamSlot("M", default=192),
).set_override_name("slimmable_elic_ha")
