"""CombinedTopoGroupCoder sub-config (prior-coder library).

Parity: reference configs/codecs/general/prior_models/prior_coders/combined_pgm_coder.py
(wraps pgm_coder.CombinedNNTrainablePGMPriorCoder; SURVEY.md §2.7 sub-config module library). Every defaulted
keyword field of the target is exposed as an addressable ParamSlot.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.combined_coder import CombinedTopoGroupCoder

config = ClassBuilder(
    CombinedTopoGroupCoder,
    channels=ParamSlot("channels", default=192)
).add_all_kwargs_as_param_slot().set_override_name("combined_pgm_coder")
