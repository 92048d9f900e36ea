"""Param-generator sub-config: Gumbel-softmax categorical parameters (CategoricalParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/categorical.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.CategoricalParameterGenerator,
    shape=ParamSlot("shape", default=(4,)),
    num_categories=ParamSlot("num_categories", default=2),
    gs_temp=ParamSlot("gs_temp", default=0.5),
    freeze_params=ParamSlot("freeze_params", default=False),
).set_override_name("pg_categorical")
