"""Base lossy autoencoder prior-model sub-config.

Parity: reference configs/codecs/general/prior_models/
base_lossy_autoencoder.py (BaseLossyAutoEncoderPriorModel,
autoencoder_v2.py:26 — lossy AE with prior_coder / lambda_rd /
distortion_type slots). Maps to NeuralImageCodec over ScaleHyperprior."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.neural import NeuralImageCodec
from cbench_basic_tpu.nn.models import ScaleHyperprior


def _build(N=128, M=192, lmbda=0.01):
    return NeuralImageCodec(ScaleHyperprior(N=N, M=M), lmbda=lmbda)


config = ClassBuilder(
    _build,
    N=ParamSlot("N", default=128),
    M=ParamSlot("M", default=192),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("base_lossy_autoencoder")
