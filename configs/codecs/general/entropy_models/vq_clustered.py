"""k-means-clustered VQ entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/vq_clustered.py
(VQ-clustered distribution coding, dist_entropy.py). Maps to
VQClusteredCoder (graph/dist_coders.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.dist_coders import VQClusteredCoder

config = ClassBuilder(
    VQClusteredCoder,
    channels=ParamSlot("channels", default=192),
).add_all_kwargs_as_param_slot().set_override_name("vq_clustered")
