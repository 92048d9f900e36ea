"""Multi-latent (split-channel) hierarchical prior-coder sub-config.

Parity: reference configs/codecs/general/prior_models/prior_coders/
hierarchical.py (wraps HierarchicalNNPriorCoder). The repo analog splits
the latent channelwise across a list of sub-coders
(MultiLatentPriorCoder, prior_coders/continuous.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.prior_coders import (
    GaussianPriorCoder,
    MultiLatentPriorCoder,
    VQPriorCoder,
)


def _build(split_sizes=(96, 96), vq_embeddings=64, vq_dim=16):
    coders = (
        GaussianPriorCoder(channels=split_sizes[0]),
        VQPriorCoder(num_groups=split_sizes[1] // vq_dim,
                     num_embeddings=vq_embeddings,
                     embedding_dim=vq_dim),
    )
    return MultiLatentPriorCoder(coders=coders,
                                 split_sizes=tuple(split_sizes))


config = ClassBuilder(
    _build,
    split_sizes=ParamSlot("split_sizes", default=(96, 96)),
    vq_embeddings=ParamSlot("vq_embeddings", default=64),
    vq_dim=ParamSlot("vq_dim", default=16),
).set_override_name("hierarchical")
