"""ContinuousToDiscretePriorCoder sub-config (prior-coder library).

Parity: reference configs/codecs/general/prior_models/prior_coders/dist.py
(wraps DistributionPriorCoder (base)). Every defaulted keyword field is an addressable ParamSlot."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.prior_coders import ContinuousToDiscretePriorCoder

config = ClassBuilder(
    ContinuousToDiscretePriorCoder,
).add_all_kwargs_as_param_slot().set_override_name("dist")
