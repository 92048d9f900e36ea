"""PGM edge: generic grouped-conv transform with a kind/agg choice slot.

Parity: reference configs/nnmodules/layers/pgm/groupconv.py over
GroupConv2dPGMModel (pgm_layers.py:181)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.groupconv import GroupConvTransform
from cbench_basic_tpu.nn.slimmable import PGMSlimmableEdge


def _build(kind="a", groups=4, num_levels=5, mid_per_group=48,
           in_channels=3, out_channels=192, agg="out"):
    return PGMSlimmableEdge(
        GroupConvTransform(kind=kind, groups=groups, num_levels=num_levels,
                           mid_per_group=mid_per_group,
                           in_channels=in_channels,
                           out_channels=out_channels, agg=agg),
        num_levels=num_levels)


config = ClassBuilder(
    _build,
    kind=ParamSlot("kind", choices=["a", "s", "ha", "hs"], default="a"),
    groups=ParamSlot("groups", default=4),
    num_levels=ParamSlot("levels", default=5),
    mid_per_group=ParamSlot("mid_per_group", default=48),
    in_channels=ParamSlot("in_channels", default=3),
    out_channels=ParamSlot("out_channels", default=192),
    agg=ParamSlot("agg", choices=["out", "none", "pre", "post0", "post1",
                                  "post2"], default="out"),
).set_override_name("pgm_groupconv")
