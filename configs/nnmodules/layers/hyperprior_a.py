"""Layer sub-config: fixed-width hyperprior g_a conv+GDN stack (Balle 2018; reference cbench/nn/models/google.py).

Parity: reference configs/nnmodules/layers/hyperprior_a.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import AnalysisTransform

config = ClassBuilder(
    AnalysisTransform,
    N=ParamSlot("N", default=128),
    M=ParamSlot("M", default=192),
).set_override_name("hyperprior_a")
