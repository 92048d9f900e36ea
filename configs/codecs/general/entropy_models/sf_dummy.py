"""Straightforward (passthrough) dummy coder sub-config.

Parity: reference configs/codecs/general/entropy_models/sf_dummy.py
(StraightForwardDummyEntropyCoder, latent_graph.py:254-267). Maps to
StraightForwardDummyCoder."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import StraightForwardDummyCoder

config = ClassBuilder(
    StraightForwardDummyCoder,
).set_override_name("sf_dummy")
