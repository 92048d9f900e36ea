"""Param-generator sub-config: relaxed-Bernoulli gate parameters (BernoulliParameterGenerator).

Parity: reference configs/nnmodules/layers/param_generator/bernoulli.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

config = ClassBuilder(
    pg.BernoulliParameterGenerator,
    num_slots=ParamSlot("num_slots", default=4),
    init_logit=ParamSlot("init_logit", default=2.0),
).set_override_name("pg_bernoulli")
