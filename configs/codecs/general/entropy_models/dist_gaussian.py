"""Gaussian distribution-grid entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/dist_gaussian.py
(GaussianDistributionEntropyCoder, dist_entropy.py:608-700). Maps to
DistributionGridCoder(kind="gaussian"); module-level bit-parity with the
reference grid coder is held by compat.RefGaussianGridCoder
(tests/test_module_golden.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.dist_coders import DistributionGridCoder

config = ClassBuilder(
    DistributionGridCoder,
    channels=ParamSlot("channels", default=192),
    kind="gaussian",
).add_all_kwargs_as_param_slot().set_override_name("dist_gaussian")
