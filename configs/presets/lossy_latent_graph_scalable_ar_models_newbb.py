"""BaSIC scalable presets on the NEW backbones (Cheng2020 / ELIC).

Parity: reference configs/presets/
lossy_latent_graph_scalable_ar_models_newbb.py — the published scalable
AR models rebuilt over slimmable_cheng2020_* / slimmable_elic_* PGM
layers instead of the plain hyperprior conv stacks (the import block at
:24-43 wires exactly those pgm layer configs).

Builders mirror presets/lossy_latent_graph_scalable_ar_models.py with a
backbone argument threaded into build_basic_scalable_graph.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.base import GroupedVariableRateCodec
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.builders import build_basic_scalable_graph

LAMBDAS = [39.015 / 255 ** 2, 75.8625 / 255 ** 2,
           145.2225 / 255 ** 2, 281.775 / 255 ** 2]
WIDTHS = (48, 72, 96, 144, 192)
N = 192
M = 192


def _codec(lmbda, backbone, seed=0, widths=WIDTHS, n=N, m=M,
           num_complex_levels=None):
    model, specs, levels = build_basic_scalable_graph(
        N=n, M=m, lmbda=lmbda, widths=widths, pattern="elic",
        num_channel_groups=5, num_complex_levels=num_complex_levels,
        backbone=backbone)
    codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                             lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


def cheng2020_ar_sc_slimmable_full_dynamic_grouped(**kw):
    """Cheng2020 residual+attention backbone, 4 lambda points."""
    return GroupedVariableRateCodec(
        [_codec(l, "cheng2020", seed=i, **kw)
         for i, l in enumerate(LAMBDAS)])


def cheng2020_noattn_ar_sc_slimmable_grouped(**kw):
    return GroupedVariableRateCodec(
        [_codec(l, "cheng2020_noattn", seed=i, **kw)
         for i, l in enumerate(LAMBDAS)])


def elic_ar_sc_slimmable_full_dynamic_grouped(**kw):
    """ELIC bottleneck+attention backbone, 4 lambda points."""
    return GroupedVariableRateCodec(
        [_codec(l, "elic", seed=i, **kw) for i, l in enumerate(LAMBDAS)])


def elic_noattn_ar_sc_slimmable_grouped(**kw):
    return GroupedVariableRateCodec(
        [_codec(l, "elic_noattn", seed=i, **kw)
         for i, l in enumerate(LAMBDAS)])


PRESETS = {
    "cheng2020-ar-sc-slimmable-full-dynamic-grouped":
        cheng2020_ar_sc_slimmable_full_dynamic_grouped,
    "cheng2020-noattn-ar-sc-slimmable-grouped":
        cheng2020_noattn_ar_sc_slimmable_grouped,
    "elic-ar-sc-slimmable-full-dynamic-grouped":
        elic_ar_sc_slimmable_full_dynamic_grouped,
    "elic-noattn-ar-sc-slimmable-grouped":
        elic_noattn_ar_sc_slimmable_grouped,
}
