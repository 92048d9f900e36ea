"""Param-generator sub-config: transformer predictor over flattened 2-D tokens (Transformer2dParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/transformer2d.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.TransformerPredictorParameterGenerator,
    out_channels=ParamSlot("out_channels", default=64),
    dim_embed=ParamSlot("dim_embed", default=96),
    depth=ParamSlot("depth", default=2),
    heads=ParamSlot("heads", default=4),
).set_override_name("pg_transformer2d")
