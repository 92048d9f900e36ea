"""Param-generator sub-config: select one of a fixed value list by index (IndexParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/index.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.IndexParameterGenerator,
    values=ParamSlot("values", default=[0, 1, 2, 3]),
    default_index=ParamSlot("default_index", default=-1),
    fix_for_inference=ParamSlot("fix_for_inference", default=False),
).set_override_name("pg_index")
