"""Param-generator sub-config: index into a stacked parameter bank (IndexSelectParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/index_select.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.IndexSelectParameterGenerator,
    bank=ParamSlot("bank", default=((0.0, 0.0), (1.0, 1.0))),
    axis=ParamSlot("axis", default=0),
    default_index=ParamSlot("default_index", default=-1),
).set_override_name("pg_index_select")
