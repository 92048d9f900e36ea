"""Google (Ballé/Minnen) lossy autoencoder prior-model sub-config.

Parity: reference configs/codecs/general/prior_models/
lossy_autoencoder_google.py (GoogleLossyAutoEncoderPriorModel,
autoencoder_v2.py:670 — the hyperprior a/s/ha/hs stack). Maps to
NeuralImageCodec over MeanScaleHyperprior."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

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
).set_override_name("lossy_autoencoder_google")
