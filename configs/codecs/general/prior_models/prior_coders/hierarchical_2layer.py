"""Two-layer hierarchical prior-coder sub-config.

Parity: reference configs/codecs/general/prior_models/prior_coders/
hierarchical_2layer.py (wraps Hierarchical2LayerNNPriorCoder,
prior_coder/__init__.py:103-240). Composes outer Gaussian-conditional
coding over an inner VQ latent with hyper down/up transforms.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import GaussianCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    HyperAnalysisTransform,
    HyperSynthesisTransform,
)
from cbench_basic_tpu.prior_coders import (
    Hierarchical2LayerPriorCoder,
    VQPriorCoder,
)


def _build(channels=192, inner_groups=8, inner_embeddings=64,
           inner_dim=16, hyper_n=128):
    return Hierarchical2LayerPriorCoder(
        outer=GaussianCoder(channels=channels),
        inner=VQPriorCoder(num_groups=inner_groups,
                           num_embeddings=inner_embeddings,
                           embedding_dim=inner_dim),
        down=HyperAnalysisTransform(hyper_n, inner_groups * inner_dim),
        # outer GaussianCoder consumes a 2*channels prior (mean || scale)
        up=HyperSynthesisTransform(hyper_n, 2 * channels),
    )


config = ClassBuilder(
    _build,
    channels=ParamSlot("channels", default=192),
    inner_groups=ParamSlot("inner_groups", default=8),
    inner_embeddings=ParamSlot("inner_embeddings", default=64),
    inner_dim=ParamSlot("inner_dim", default=16),
    hyper_n=ParamSlot("hyper_n", default=128),
).set_override_name("hierarchical_2layer")
