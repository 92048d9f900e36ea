"""Layer sub-config: fixed-width hyperprior g_s deconv+IGDN stack (Balle 2018; reference cbench/nn/models/google.py).

Parity: reference configs/nnmodules/layers/hyperprior_s.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import SynthesisTransform

config = ClassBuilder(
    SynthesisTransform,
    N=ParamSlot("N", default=128),
).set_override_name("hyperprior_s")
