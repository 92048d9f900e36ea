"""VQ-VAE prior model restored from a pretrained checkpoint.

Parity: reference configs/codecs/general/prior_models/vqvae_pretrained.py
(VQVAEPreTrainedPriorModel over a PretrainedModelBuilder) — params load
from a pickle/msgpack path via the codec's load_params."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
from cbench_basic_tpu.nn.models import VQVAE


def _build(hidden=128, dim=64, num_codes=512, checkpoint=None):
    codec = VQVAECodec(VQVAE(hidden=hidden, dim=dim, num_codes=num_codes))
    if checkpoint and os.path.isfile(checkpoint):
        import pickle
        with open(checkpoint, "rb") as f:
            codec.params = pickle.load(f)
    return codec


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
    num_codes=ParamSlot("num_codes", default=512),
    checkpoint=ParamSlot("checkpoint", default=None),
).set_override_name("vqvae_pretrained")
