"""Prior-coder zoo: VAE-style latent coders pluggable as latent-graph nodes.

Parity target: the reference's prior_coder library
(cbench/modules/prior_model/prior_coder/__init__.py:79-6368, ~40 classes).
Every coder follows the node-coder protocol (graph/node_coders.py):
``__call__(value, prior=None, training, rng) -> {"value_hat", "likelihood",
"loss_*", "metrics"}`` so it drops into LatentGraphModel; coders whose rate
is a static per-plane PMF additionally implement the PerChannelPMFCoder
coding protocol (pmf_table/symbols/dequantize) and therefore compress /
decompress through the real rANS backend with no extra glue.

Rate conventions: codable coders return the TRUE coding likelihood (prior
PMF probability of the coded symbol); variational-only coders return
exp(-KL) per element so the graph's bpp metric reads as the ELBO rate.
"""

from .categorical import (
    AutoregressiveCategoricalPriorCoder,
    CategoricalPriorCoder,
    GaussianEmbeddingCategoricalPriorCoder,
    ResampledStickBreakingCategoricalPriorCoder,
    StickBreakingPriorCoder,
)
from .continuous import (
    ContinuousBernoulliARPriorCoder,
    IGRCategoricalARPriorCoder,
    ContinuousToDiscretePriorCoder,
    GaussianC2VQPriorCoder,
    IGRCategoricalPriorCoder,
    MultiLatentPriorCoder,
)
from .gaussian_mixture import (
    CategoricalGaussianPriorCoder,
    EmbeddingCategoricalPriorCoder,
    EmbeddingGaussianPriorCategoricalCoder,
    EmbeddingStandardNormalPriorCategoricalCoder,
    FlatLinearTransformCoder,
)
from .stochastic_vq_ar import (
    ContinuousToVQPriorCoder,
    StochasticVQARPriorCoder,
    VQPriorStochasticVQARPriorCoder,
)
from .distribution_vq import (
    LRMultivarGaussianDistributionVQPriorCoder,
    UnivarGaussianDistributionVQPriorCoder,
    VQGaussianEmbeddingPriorCoder,
)
from .multichannel_vq import MultiChannelVQPriorCoder
from .vq import GaussianVQPriorCoder, SQVAEPriorCoder, VQPriorCoder
from .vae import (
    BetaBernoulliGaussianPriorCoder,
    GaussianMixturePriorCoder,
    GaussianPriorCoder,
)
from .hierarchical import (
    Hierarchical2LayerPriorCoder,
    HierarchicalPriorCoder,
    hierarchical_graph_nodes,
)

__all__ = [
    "AutoregressiveCategoricalPriorCoder",
    "BetaBernoulliGaussianPriorCoder",
    "CategoricalGaussianPriorCoder",
    "CategoricalPriorCoder",
    "ContinuousToVQPriorCoder",
    "EmbeddingCategoricalPriorCoder",
    "EmbeddingGaussianPriorCategoricalCoder",
    "EmbeddingStandardNormalPriorCategoricalCoder",
    "StochasticVQARPriorCoder",
    "VQPriorStochasticVQARPriorCoder",
    "FlatLinearTransformCoder",
    "ContinuousBernoulliARPriorCoder",
    "ContinuousToDiscretePriorCoder",
    "GaussianC2VQPriorCoder",
    "GaussianEmbeddingCategoricalPriorCoder",
    "GaussianMixturePriorCoder",
    "GaussianPriorCoder",
    "GaussianVQPriorCoder",
    "Hierarchical2LayerPriorCoder",
    "HierarchicalPriorCoder",
    "IGRCategoricalARPriorCoder",
    "IGRCategoricalPriorCoder",
    "LRMultivarGaussianDistributionVQPriorCoder",
    "MultiChannelVQPriorCoder",
    "MultiLatentPriorCoder",
    "SQVAEPriorCoder",
    "ResampledStickBreakingCategoricalPriorCoder",
    "StickBreakingPriorCoder",
    "UnivarGaussianDistributionVQPriorCoder",
    "VQGaussianEmbeddingPriorCoder",
    "VQPriorCoder",
    "hierarchical_graph_nodes",
]
