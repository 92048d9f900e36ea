"""Param-generator sub-config: split a tensor and pick/postprocess a section (TensorSplitGenerator).

Parity: reference configs/nnmodules/layers/param_generator/tensor_split.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.TensorSplitGenerator,
    num_or_sections=ParamSlot("num_or_sections", default=2),
    axis=ParamSlot("axis", default=0),
).set_override_name("pg_tensor_split")
