"""Param-generator sub-config: expose a flax module's parameter pytree as generated params (NNModuleParameterWrapper).

Parity: reference configs/nnmodules/layers/param_generator/nnmodule_param_wrapper.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.NNModuleParameterWrapper,
    module=ParamSlot("module", default=None),
    input_shape=ParamSlot("input_shape", default=(1, 8, 8, 3)),
    name_filter=ParamSlot("name_filter", default=None),
    freeze_params=ParamSlot("freeze_params", default=False),
).set_override_name("pg_nnmodule_param_wrapper")
