"""PGM edge: slimmable-width SFMA-modulated analysis (spatial-frequency adaptors after each GDN).

Parity: reference configs/nnmodules/layers/pgm/slimmable_sfma_hyperprior_a.py over
SFMAHyperpriorAnalysisSlimmableConv2dPGMModel (pgm_layers.py:984)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import SFMAHyperpriorAnalysisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, M=192, sfma_mid_widths=(16, 32, 64), num_modulators=1):
    widths = tuple(widths)
    return PGMSlimmableEdge(SFMAHyperpriorAnalysisTransform(widths, M=M, sfma_mid_widths=sfma_mid_widths, num_modulators=num_modulators),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    sfma_mid_widths=ParamSlot("sfma_mid_widths", default=(16, 32, 64)),
    num_modulators=ParamSlot("num_modulators", default=1),
).set_override_name("slimmable_sfma_hyperprior_a")
