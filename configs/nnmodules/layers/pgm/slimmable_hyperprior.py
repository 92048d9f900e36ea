"""PGM edge: generic slimmable hyperprior head with a kind choice slot
(a / s / ha / hs).

Parity: reference configs/nnmodules/layers/pgm/slimmable_hyperprior.py
over HyperpriorSlimmableConv2dPGMModel (pgm_layers.py:898)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.slimmable import (
    DEFAULT_WIDTHS,
    PGMSlimmableEdge,
    SlimmableAnalysisTransform,
    SlimmableHyperAnalysisTransform,
    SlimmableHyperSynthesisTransform,
    SlimmableSynthesisTransform,
)

_KINDS = {
    "a": lambda w, M, N: SlimmableAnalysisTransform(w, M),
    "s": lambda w, M, N: SlimmableSynthesisTransform(w, M),
    "ha": lambda w, M, N: SlimmableHyperAnalysisTransform(w, N, M),
    "hs": lambda w, M, N: SlimmableHyperSynthesisTransform(
        w, N, out_channels=M),
}


def _build(kind="a", widths=DEFAULT_WIDTHS, M=192, N=192):
    widths = tuple(widths)
    return PGMSlimmableEdge(_KINDS[kind](widths, M, N),
                            num_levels=len(widths))


config = ClassBuilder(
    _build,
    kind=ParamSlot("kind", choices=sorted(_KINDS), default="a"),
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    N=ParamSlot("N", default=192),
).set_override_name("slimmable_hyperprior")
