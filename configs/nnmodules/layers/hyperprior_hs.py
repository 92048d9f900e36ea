"""Layer sub-config: fixed-width hyperprior h_s hyper-synthesis (Balle 2018; reference cbench/nn/models/google.py).

Parity: reference configs/nnmodules/layers/hyperprior_hs.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import HyperSynthesisTransform

config = ClassBuilder(
    HyperSynthesisTransform,
    N=ParamSlot("N", default=128),
    out_channels=ParamSlot("out_channels", default=192),
).set_override_name("hyperprior_hs")
