"""PGM edge: slimmable-width ELIC analysis (bottleneck groups + attention).

Parity: reference configs/nnmodules/layers/pgm/slimmable_elic_a.py over
ELICAnalysisSlimmableConv2dPGMModel (pgm_layers.py:1206)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import ELICAnalysisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, M=192, attn=True):
    widths = tuple(widths)
    return PGMSlimmableEdge(ELICAnalysisTransform(widths, M=M, attn=attn),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    attn=ParamSlot("attn", default=True),
).set_override_name("slimmable_elic_a")
