"""Layer sub-config: mean-scale hyper-analysis head (MeanScaleHyperprior h_a over y; reference google.py MeanScaleHyperprior).

Parity: reference configs/nnmodules/layers/hyperprior_ms_ha.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import HyperAnalysisTransform

config = ClassBuilder(
    HyperAnalysisTransform,
    N=ParamSlot("N", default=128),
    use_abs=ParamSlot("use_abs", default=False),
).set_override_name("hyperprior_ms_ha")
