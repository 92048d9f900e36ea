"""PGM edge: a single slimmable conv stage (width list sliced per level).

Parity: reference configs/nnmodules/layers/pgm/slimmableconv.py over
SlimmableConv2dPGMModel (pgm_layers.py:714)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import _SConvStage
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(widths=DEFAULT_WIDTHS, max_in=3, kernel=5, stride=2):
    widths = tuple(widths)
    return PGMSlimmableEdge(
        _SConvStage(widths, max_in=max_in, kernel=kernel, stride=stride),
        num_levels=len(widths))


config = ClassBuilder(
    _build,
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    max_in=ParamSlot("in_channels", default=3),
    kernel=ParamSlot("kernel", default=5),
    stride=ParamSlot("stride", default=2),
).set_override_name("pgm_slimmableconv")
