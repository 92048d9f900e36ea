"""PGM edge: slimmable-width hyperprior synthesis (g_s).

Parity: reference configs/nnmodules/layers/pgm/slimmable_hyperprior_s.py over
HyperpriorSynthesisSlimmableConv2dPGMModel (pgm_layers.py:917)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableSynthesisTransform,
)


def _build(widths=DEFAULT_WIDTHS, M=192, out_channels=3):
    widths = tuple(widths)
    return PGMSlimmableEdge(SlimmableSynthesisTransform(widths, M=M, out_channels=out_channels),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    out_channels=ParamSlot("out_channels", default=3),
).set_override_name("slimmable_hyperprior_s")
