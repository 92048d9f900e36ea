"""Param-generator sub-config: DCGAN-style upsampling map generator (ConvTranspose2dParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/convtranspose2d.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.ConvTranspose2dParameterGenerator,
    in_channels=ParamSlot("in_channels", default=64),
    out_channels=ParamSlot("out_channels", default=64),
    base_size=ParamSlot("base_size", default=4),
    num_upsamples=ParamSlot("num_upsamples", default=4),
).set_override_name("pg_convtranspose2d")
