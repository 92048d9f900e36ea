"""Self-trainable VQ-VAE prior model (EMA codebook): carries its own
trainer through the SelfTrainableInterface protocol.

Parity: reference configs/codecs/general/prior_models/vqvae_selftrain.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
from cbench_basic_tpu.nn.models import VQVAE
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer


def _build(hidden=128, dim=64, num_codes=512, trainer=None):
    codec = VQVAECodec(VQVAE(hidden=hidden, dim=dim, num_codes=num_codes,
                             quantizer="ema"))
    if trainer is not None:
        codec.set_trainer(trainer)
    return codec


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
    num_codes=ParamSlot("num_codes", default=512),
    trainer=ParamSlot("trainer", default=None),
).set_override_name("vqvae_selftrain")
