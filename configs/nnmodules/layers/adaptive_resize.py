"""Layer sub-config: conv-based adaptive feature resizer (AdaptiveResize2DLayer, cbench/nn/layers/basic.py:116).

Parity: reference configs/nnmodules/layers/adaptive_resize.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.layers import AdaptiveResize2D

config = ClassBuilder(
    AdaptiveResize2D,
    in_channels=ParamSlot("in_channels", default=192),
    out_channels=ParamSlot("out_channels", default=0),
    hidden_channels=ParamSlot("hidden_channels", default=0),
    num_residual_layers=ParamSlot("num_residual_layers", default=2),
    num_downsample_layers=ParamSlot("num_downsample_layers", default=0),
    num_upsample_layers=ParamSlot("num_upsample_layers", default=0),
    adaptive_output_spatial_size=ParamSlot("adaptive_output_spatial_size", default=0),
    adaptive_pooling_method=ParamSlot("adaptive_pooling_method", default='avg'),
).set_override_name("adaptive_resize")
