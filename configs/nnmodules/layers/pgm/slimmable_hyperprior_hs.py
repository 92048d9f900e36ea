"""PGM edge: slimmable-width hyperprior hyper synthesis (h_s).

Parity: reference configs/nnmodules/layers/pgm/slimmable_hyperprior_hs.py over
HyperpriorHyperSynthesisSlimmableConv2dPGMModel (pgm_layers.py:941)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableHyperSynthesisTransform,
)


def _build(widths=DEFAULT_WIDTHS, N=192, out_channels=384):
    widths = tuple(widths)
    return PGMSlimmableEdge(SlimmableHyperSynthesisTransform(widths, N=N, out_channels=out_channels),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    N=ParamSlot("N", default=192),
    out_channels=ParamSlot("out_channels", default=384),
).set_override_name("slimmable_hyperprior_hs")
