"""CompressAI joint-autoregressive coder adapter.

Parity: reference configs/codecs/general/prior_models/prior_coders/
compressai_jointautoregressive_coder.py (CompressAIJointAutoregressiveCoder
— Minnen 2018 joint AR+hyperprior) over the repo's mean-scale hyperprior
with the FSAR in-loop AR path (codecs/fsar.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.neural import NeuralImageCodec
from cbench_basic_tpu.nn.models import MeanScaleHyperprior


def _build(N=128, M=192, lmbda=0.01):
    return NeuralImageCodec(MeanScaleHyperprior(N=N, M=M), lmbda=lmbda)


config = ClassBuilder(
    _build,
    N=ParamSlot("N", default=128),
    M=ParamSlot("M", default=192),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("compressai_jointautoregressive_coder")
