"""PGM edge: slimmable-width Cheng2020 analysis without attention.

Parity: reference configs/nnmodules/layers/pgm/slimmable_cheng2020_noattn_a.py over
Cheng2020NoAttnAnalysisSlimmableConv2dPGMModel (pgm_layers.py:1109)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import Cheng2020AnalysisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, M=192, attn=False):
    widths = tuple(widths)
    return PGMSlimmableEdge(Cheng2020AnalysisTransform(widths, M=M, attn=attn),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    attn=ParamSlot("attn", default=False),
).set_override_name("slimmable_cheng2020_noattn_a")
