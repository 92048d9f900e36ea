"""Combined lossy-dummy coder sub-config.

Parity: reference configs/codecs/general/entropy_models/lossy_dummy_combined.py
(CombinedLossyDummyEntropyCoder, latent_graph.py:225-251 — blend-weighted
sum of sub-coder distortions). Maps to CombinedLossyCoder."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import CombinedLossyCoder

config = ClassBuilder(
    CombinedLossyCoder,
    lmbda=ParamSlot("lmbda", default=0.01),
    distortions=ParamSlot("distortions", default=("mse", "ms_ssim")),
).set_override_name("lossy_dummy_combined")
