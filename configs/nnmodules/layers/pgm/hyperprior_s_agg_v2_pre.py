"""PGM edge: grouped-conv hyperprior s head (agg=pre).

Parity: reference configs/nnmodules/layers/pgm/hyperprior_s_agg_v2_pre.py over
HyperpriorSynthesisAggregateV2PreGDNGroupConv2dPGMModel (pgm_layers.py:552) — here nn/groupconv.py GroupConvTransform wrapped by
PGMSlimmableEdge (complexity level = active group count)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.groupconv import GroupConvTransform
from cbench_basic_tpu.nn.slimmable import PGMSlimmableEdge


def _build(groups=4, num_levels=5, mid_per_group=48, in_channels=192,
           out_channels=3):
    return PGMSlimmableEdge(
        GroupConvTransform(kind="s", groups=groups,
                           num_levels=num_levels,
                           mid_per_group=mid_per_group,
                           in_channels=in_channels,
                           out_channels=out_channels, agg="pre"),
        num_levels=num_levels)


config = ClassBuilder(
    _build,
    groups=ParamSlot("groups", default=4),
    num_levels=ParamSlot("levels", default=5),
    mid_per_group=ParamSlot("mid_per_group", default=48),
    in_channels=ParamSlot("in_channels", default=192),
    out_channels=ParamSlot("out_channels", default=3),
).set_override_name("hyperprior_s_agg_v2_pre")
