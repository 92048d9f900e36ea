"""PGM edge: generic SFMA hyperprior head with a kind choice slot.

Parity: reference configs/nnmodules/layers/pgm/
slimmable_sfma_hyperprior.py over
SFMAHyperpriorSlimmableConv2dPGMModel (pgm_layers.py:953)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.backbones import (
    SFMAHyperpriorAnalysisTransform,
    SFMAHyperpriorSynthesisTransform,
)
from cbench_basic_tpu.nn.slimmable import DEFAULT_WIDTHS, PGMSlimmableEdge


def _build(kind="a", widths=DEFAULT_WIDTHS, M=192,
           sfma_mid_widths=(16, 32, 64), num_modulators=1, sfma_idx=0):
    widths = tuple(widths)
    cls = (SFMAHyperpriorAnalysisTransform if kind == "a"
           else SFMAHyperpriorSynthesisTransform)
    return PGMSlimmableEdge(
        cls(widths, M=M, sfma_mid_widths=tuple(sfma_mid_widths),
            num_modulators=num_modulators, sfma_idx=sfma_idx),
        num_levels=len(widths))


config = ClassBuilder(
    _build,
    kind=ParamSlot("kind", choices=["a", "s"], default="a"),
    widths=ParamSlot("widths", default=DEFAULT_WIDTHS),
    M=ParamSlot("M", default=192),
    sfma_mid_widths=ParamSlot("sfma_mid_widths", default=(16, 32, 64)),
    num_modulators=ParamSlot("num_modulators", default=1),
    sfma_idx=ParamSlot("sfma_idx", default=0),
).set_override_name("slimmable_sfma_hyperprior")
