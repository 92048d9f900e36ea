"""Slimmable Google lossy autoencoder prior-model sub-config.

Parity: reference configs/codecs/general/prior_models/
lossy_autoencoder_google_slimmable.py (SlimmableLossyAutoEncoderPriorModel,
autoencoder_v2.py:696 — width-switchable hyperprior). Maps to the
latent-graph scalable build (PGMSlimmableEdge widths over the hyperprior
graph) exposed as a LatentGraphCodec."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.builders import build_scalable_hyperprior_graph


def _build(variant="slimmable-dynamic", lmbda=0.01, **kwargs):
    model, node_specs, complexity_levels = build_scalable_hyperprior_graph(
        variant=variant, lmbda=lmbda)
    return LatentGraphCodec(model, node_specs, lmbda=lmbda,
                            complexity_levels=complexity_levels, **kwargs)


config = ClassBuilder(
    _build,
    variant=ParamSlot("variant", default="slimmable-dynamic"),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("lossy_autoencoder_google_slimmable")
