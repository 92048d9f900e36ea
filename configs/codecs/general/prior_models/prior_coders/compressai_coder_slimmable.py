"""SlimmableFactorizedCoder sub-config (prior-coder library).

Parity: reference configs/codecs/general/prior_models/prior_coders/compressai_coder_slimmable.py
(wraps compressai_coder.CompressAISlimmableEntropyBottleneckPriorCoder; SURVEY.md §2.7 sub-config module library). Every defaulted
keyword field of the target is exposed as an addressable ParamSlot.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import SlimmableFactorizedCoder

config = ClassBuilder(
    SlimmableFactorizedCoder,
    channels=ParamSlot("channels", default=192),
    channels_list=ParamSlot("channels_list", default=(48, 96, 144, 192))
).add_all_kwargs_as_param_slot().set_override_name("compressai_coder_slimmable")
