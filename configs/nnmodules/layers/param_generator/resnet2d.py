"""Param-generator sub-config: residual conv predictor over a 2-D feature map (ResNet2dParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/resnet2d.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.ConvPredictorParameterGenerator,
    out_channels=ParamSlot("out_channels", default=64),
    hidden=ParamSlot("hidden", default=128),
    depth=ParamSlot("depth", default=2),
    residual=ParamSlot("residual", default=True),
).set_override_name("pg_resnet2d")
