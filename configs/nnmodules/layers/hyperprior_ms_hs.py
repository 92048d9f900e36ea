"""Layer sub-config: mean-scale hyper-synthesis head emitting (mean, scale) pairs — M doubled (reference google.py MeanScaleHyperprior).

Parity: reference configs/nnmodules/layers/hyperprior_ms_hs.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import HyperSynthesisTransform

config = ClassBuilder(
    HyperSynthesisTransform,
    N=ParamSlot("N", default=128),
    out_channels=ParamSlot("out_channels", default=384),
).set_override_name("hyperprior_ms_hs")
