"""Layer sub-config: fixed-width hyperprior h_a hyper-analysis (Balle 2018; reference cbench/nn/models/google.py).

Parity: reference configs/nnmodules/layers/hyperprior_ha.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import HyperAnalysisTransform

config = ClassBuilder(
    HyperAnalysisTransform,
    N=ParamSlot("N", default=128),
    use_abs=ParamSlot("use_abs", default=True),
).set_override_name("hyperprior_ha")
