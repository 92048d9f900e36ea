"""Lossy-dummy x-node coder sub-config.

Parity: reference configs/codecs/general/entropy_models/lossy_dummy.py
(LossyDummyEntropyCoder, latent_graph.py:68-144). Maps to LossyDummyCoder."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import LossyDummyCoder

config = ClassBuilder(
    LossyDummyCoder,
    lmbda=ParamSlot("lmbda", default=0.01),
    distortion=ParamSlot("distortion", default="mse",
                         choices={"mse": "mse", "ms_ssim": "ms_ssim"}),
).set_override_name("lossy_dummy")
