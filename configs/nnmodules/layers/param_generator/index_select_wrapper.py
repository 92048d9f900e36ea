"""Param-generator sub-config: wrap another generator, indexing its stacked output (IndexSelectParameterGeneratorWrapper).

Parity: reference configs/nnmodules/layers/param_generator/index_select_wrapper.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.IndexSelectParameterGeneratorWrapper,
    generator=ParamSlot("generator", default=None),
    num_choices=ParamSlot("num_choices", default=2),
    axis=ParamSlot("axis", default=0),
).set_override_name("pg_index_select_wrapper")
