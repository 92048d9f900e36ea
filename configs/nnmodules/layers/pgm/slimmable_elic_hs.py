"""PGM edge: slimmable-width ELIC hyper synthesis.

Parity: reference configs/nnmodules/layers/pgm/slimmable_elic_hs.py over
ELICHyperSynthesisSlimmableConv2dPGMModel (pgm_layers.py:1259)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import ELICHyperSynthesisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, N=192, out_channels=384):
    widths = tuple(widths)
    return PGMSlimmableEdge(ELICHyperSynthesisTransform(widths, N=N, out_channels=out_channels),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    N=ParamSlot("N", default=192),
    out_channels=ParamSlot("out_channels", default=384),
).set_override_name("slimmable_elic_hs")
