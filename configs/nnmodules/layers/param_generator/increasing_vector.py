"""Param-generator sub-config: monotone non-decreasing vector via cumulated softplus deltas (IncreasingVectorGenerator).

Parity: reference configs/nnmodules/layers/param_generator/increasing_vector.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.IncreasingVectorGenerator,
    length=ParamSlot("length", default=4),
    minimum=ParamSlot("minimum", default=0.0),
    min_delta=ParamSlot("min_delta", default=0.0),
).set_override_name("pg_increasing_vector")
