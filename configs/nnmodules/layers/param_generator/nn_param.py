"""Param-generator sub-config: raw trainable tensor parameter (NNParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/nn_param.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.NNParameterGenerator,
    shape=ParamSlot("shape", default=(4,)),
    init_method=ParamSlot("init_method", default='zeros'),
    freeze_params=ParamSlot("freeze_params", default=False),
    no_params=ParamSlot("no_params", default=False),
).set_override_name("pg_nn_param")
