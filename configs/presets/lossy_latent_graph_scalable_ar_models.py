"""The published BaSIC model presets.

Parity: reference configs/presets/lossy_latent_graph_scalable_ar_models.py —
the four released configurations (:692,:708,:733,:761):
  * hyperprior-ar-sc-slimmable-full-dynamic-grouped
  * hyperprior-ar-sc-slimmable-full-dynamic-grouped-ft-ssim
  * hyperprior-ar-sc-slimmable-full-dynamic-greedy-search-8level
  * hyperprior-ar-sc-slimmable-full-dynamic-combined-dynamic-entropy-coder-grouped
with λ = [39.015, 75.8625, 145.2225, 281.775] (:71), slimmable mid widths
[48, 72, 96, 144, 192] (:73-113), topogroup y coder (:119-127),
entropy-bottleneck z coder (:128-133).

Each builder returns a GroupedVariableRateCodec over four per-λ codecs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.base import GroupedVariableRateCodec
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.builders import (
    build_basic_scalable_graph,
    build_hyperprior_graph,
    build_topogroup_hyperprior_graph,
)

LAMBDAS = [39.015 / 255 ** 2, 75.8625 / 255 ** 2,
           145.2225 / 255 ** 2, 281.775 / 255 ** 2]
WIDTHS = (48, 72, 96, 144, 192)
N = 192
M = 192


def _basic_codec(lmbda: float, num_complex_levels=None, seed: int = 0,
                 widths=WIDTHS, n=N, m=M) -> LatentGraphCodec:
    model, specs, levels = build_basic_scalable_graph(
        N=n, M=m, lmbda=lmbda, widths=widths, pattern="elic",
        num_channel_groups=5, num_complex_levels=num_complex_levels)
    codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                             lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


def hyperprior_ar_sc_slimmable_full_dynamic_grouped(**kw):
    """Slimmable + topogroup-AR model, 4 λ points, 5 complexity levels."""
    return GroupedVariableRateCodec(
        [_basic_codec(l, seed=i, **kw) for i, l in enumerate(LAMBDAS)])


def hyperprior_ar_sc_slimmable_full_dynamic_greedy_search_8level(**kw):
    """Same model; 8 complexity levels to be refined by the greedy search
    (controller edges x_y / y_z / z_y / y_x — the analog of the reference's
    pgmxy/pgmyz/pgmzy/pgmyx controller nodes)."""
    return GroupedVariableRateCodec(
        [_basic_codec(l, num_complex_levels=8, seed=i, **kw)
         for i, l in enumerate(LAMBDAS)])


def hyperprior_ar_sc_slimmable_full_dynamic_grouped_ft_ssim(
        stage1_params=None, **kw):
    """The ft-ssim stage-2 preset (reference :708-727): same architecture
    as the stage-1 grouped model but the x-node distortion is 1 - MS-SSIM,
    initialized from the stage-1 checkpoints. `stage1_params` is an
    optional list of per-λ param pytrees (the reference wires this through
    ClassBuilderObjRef(stage1_trainer, get_trainer_output_param_file); here
    pass GroupedVariableRateCodec.codecs[i].params or a checkpoint load)."""
    codecs = []
    for i, l in enumerate(LAMBDAS):
        model, specs, levels = build_basic_scalable_graph(
            N=kw.get("n", N), M=kw.get("m", M), lmbda=l,
            widths=kw.get("widths", WIDTHS), pattern="elic",
            num_channel_groups=5, distortion="ms_ssim")
        codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                                 lmbda=l)
        codec.init_params(jax.random.PRNGKey(i),
                          input_shape=(1, 64, 64, 3))
        if stage1_params is not None:
            codec.params = stage1_params[i]
        codecs.append(codec)
    return GroupedVariableRateCodec(codecs)


def hyperprior_ar_sc_slimmable_full_dynamic_combined_dynamic_entropy_coder_grouped(**kw):
    """The combined-dynamic-entropy-coder preset (reference :761-777): the
    y node blends AR structures (checkerboard + ELIC channel-groups) with
    dynamic mixture weights — entropy-coder structure itself becomes a
    complexity axis."""
    codecs = []
    for i, l in enumerate(LAMBDAS):
        model, specs, levels = build_basic_scalable_graph(
            N=kw.get("n", N), M=kw.get("m", M), lmbda=l,
            widths=kw.get("widths", WIDTHS), pattern="elic",
            num_channel_groups=5, combined_y=True)
        codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                                 lmbda=l)
        codec.init_params(jax.random.PRNGKey(i),
                          input_shape=(1, 64, 64, 3))
        codecs.append(codec)
    return GroupedVariableRateCodec(codecs)


# exact reference preset names (:692,:708,:733,:761) -> builders here
PRESETS = {
    "hyperprior-ar-sc-slimmable-full-dynamic-grouped":
        hyperprior_ar_sc_slimmable_full_dynamic_grouped,
    "hyperprior-ar-sc-slimmable-full-dynamic-grouped-ft-ssim":
        hyperprior_ar_sc_slimmable_full_dynamic_grouped_ft_ssim,
    "hyperprior-ar-sc-slimmable-full-dynamic-grouped-greedy-search-8level":
        hyperprior_ar_sc_slimmable_full_dynamic_greedy_search_8level,
    "hyperprior-ar-sc-slimmable-full-dynamic-combined-dynamic-entropy-coder"
    "-grouped":
        hyperprior_ar_sc_slimmable_full_dynamic_combined_dynamic_entropy_coder_grouped,
}


def hyperprior_ar_grouped(**kw):
    """Non-slimmable topogroup-AR baseline (fixed full width)."""
    codecs = []
    for i, l in enumerate(LAMBDAS):
        model, specs = build_topogroup_hyperprior_graph(
            N=N, M=M, lmbda=l, pattern="elic", num_channel_groups=5)
        c = LatentGraphCodec(model, specs, lmbda=l)
        c.init_params(jax.random.PRNGKey(i), input_shape=(1, 64, 64, 3))
        codecs.append(c)
    return GroupedVariableRateCodec(codecs)


def hyperprior_grouped(**kw):
    """Plain mean-scale hyperprior baseline as a latent graph."""
    codecs = []
    for i, l in enumerate(LAMBDAS):
        model, specs = build_hyperprior_graph(N=N, M=M, lmbda=l)
        c = LatentGraphCodec(model, specs, lmbda=l)
        c.init_params(jax.random.PRNGKey(i), input_shape=(1, 64, 64, 3))
        codecs.append(c)
    return GroupedVariableRateCodec(codecs)
