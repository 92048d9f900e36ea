"""Distribution-grid entropy-coder sub-config (logistic).

Parity: reference configs/codecs/general/entropy_models/dist.py
(DistributionEntropyCoder, dist_entropy.py:38-168 — parametric-distribution
grid coding). Maps to DistributionGridCoder(kind="logistic")."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.dist_coders import DistributionGridCoder

config = ClassBuilder(
    DistributionGridCoder,
    channels=ParamSlot("channels", default=192),
    kind=ParamSlot("kind", default="logistic",
                   choices={"logistic": "logistic", "gaussian": "gaussian"}),
).add_all_kwargs_as_param_slot().set_override_name("dist")
