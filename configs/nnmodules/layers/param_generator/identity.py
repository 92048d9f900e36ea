"""Param-generator sub-config: pass-through generator (IdentityParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/identity.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.IdentityParameterGenerator,
).set_override_name("pg_identity")
