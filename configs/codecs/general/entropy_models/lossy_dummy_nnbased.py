"""NN-perceptual lossy-dummy coder sub-config.

Parity: reference configs/codecs/general/entropy_models/lossy_dummy_nnbased.py
(NNBasedLossyDummyEntropyCoder, latent_graph.py:147 — perceptual feature
distortion). Maps to NNPerceptualLossyCoder."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import NNPerceptualLossyCoder

config = ClassBuilder(
    NNPerceptualLossyCoder,
    lmbda=ParamSlot("lmbda", default=0.01),
).add_all_kwargs_as_param_slot().set_override_name("lossy_dummy_nnbased")
