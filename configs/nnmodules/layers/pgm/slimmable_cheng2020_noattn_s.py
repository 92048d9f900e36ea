"""PGM edge: slimmable-width Cheng2020 synthesis without attention.

Parity: reference configs/nnmodules/layers/pgm/slimmable_cheng2020_noattn_s.py over
Cheng2020NoAttnSynthesisSlimmableConv2dPGMModel (pgm_layers.py:1122)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import Cheng2020SynthesisTransform
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, M=192, out_channels=3, attn=False):
    widths = tuple(widths)
    return PGMSlimmableEdge(Cheng2020SynthesisTransform(widths, M=M, out_channels=out_channels, attn=attn),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    out_channels=ParamSlot("out_channels", default=3),
    attn=ParamSlot("attn", default=False),
).set_override_name("slimmable_cheng2020_noattn_s")
