"""GaussianConditional sub-config (prior-coder library).

Parity: reference configs/codecs/general/prior_models/prior_coders/compressai_gaussian_coder.py
(wraps compressai_coder.CompressAIGaussianConditionalCoder; SURVEY.md §2.7 sub-config module library). Every defaulted
keyword field of the target is exposed as an addressable ParamSlot.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder
from cbench_basic_tpu.nn.entropy_models import GaussianConditional

config = ClassBuilder(
    GaussianConditional
).add_all_kwargs_as_param_slot().set_override_name("compressai_gaussian_coder")
