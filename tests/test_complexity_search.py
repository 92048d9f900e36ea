"""Greedy complexity search tests."""

import jax
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.builders import build_basic_scalable_graph
from cbench_basic_tpu.graph.complexity_search import (
    GreedyComplexitySearch,
    config_flops,
    post_training_complexity_search,
)


def _tiny_codec():
    model, specs, _ = build_basic_scalable_graph(
        N=8, M=12, widths=(4, 6, 8), pattern="checkerboard",
        num_channel_groups=1, context_channels=16)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return codec


def test_greedy_search_produces_monotone_flops_levels():
    model, specs, _ = build_basic_scalable_graph(
        N=8, M=12, widths=(4, 6, 8), pattern="checkerboard",
        num_channel_groups=1, context_channels=16)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

    images = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]
    levels = post_training_complexity_search(codec, images, num_levels=4)

    assert len(levels) == 4
    flops = [config_flops(model, specs, cfg) for cfg in levels]
    # Levels ordered cheapest -> most expensive, strictly covering the range.
    assert all(f1 <= f2 for f1, f2 in zip(flops, flops[1:]))
    assert levels[-1] == {n: 2 for n in levels[-1]}  # top = max widths
    assert levels[0] == {n: 0 for n in levels[0]}    # bottom = min widths

    # Searched levels drive real coding.
    codec.set_complex_level(0)
    img = images[0]
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape


def test_uniform_anchor_beats_mixed_greedy(monkeypatch):
    """With a loss that strictly penalizes mixed widths, every searched
    level must land on a uniform-width anchor (the failure mode the
    anchors exist to fix: loss-only greedy picking a bad mixture)."""
    codec = _tiny_codec()
    images = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]
    search = GreedyComplexitySearch(codec, images, num_levels=3,
                                    anchor_uniform=True)

    def fake_eval(cfg):
        vals = list(cfg.values())
        # mixtures strictly worse; among uniforms, wider slightly better
        return (max(vals) - min(vals)) - 0.001 * sum(vals)

    monkeypatch.setattr(search, "_eval_config", fake_eval)
    levels = search.search()
    assert len(levels) == 3
    for cfg in levels:
        vals = list(cfg.values())
        assert max(vals) == min(vals), f"non-uniform level survived: {cfg}"
    flops = [config_flops(codec.model, codec.node_specs, c) for c in levels]
    assert all(f1 <= f2 for f1, f2 in zip(flops, flops[1:]))


def test_monotone_repair_produces_non_increasing_loss():
    codec = _tiny_codec()
    images = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]
    levels = post_training_complexity_search(
        codec, images, num_levels=4, anchor_uniform=True,
        enforce_monotone=True)
    assert len(levels) == 4
    flops = [config_flops(codec.model, codec.node_specs, c) for c in levels]
    assert all(f1 <= f2 for f1, f2 in zip(flops, flops[1:]))
    # re-evaluating with a fresh searcher must show loss non-increasing
    # cheapest -> full (the guarantee the repair pass provides)
    search = GreedyComplexitySearch(codec, images)
    losses = [search._eval_config(c) for c in levels]
    assert all(l2 <= l1 + 1e-6 for l1, l2 in zip(losses, losses[1:])), losses


def test_iterative_search_accepts_anchor_uniform():
    codec = _tiny_codec()
    images = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]
    levels = post_training_complexity_search(
        codec, images, num_levels=3, method="iterative",
        anchor_uniform=True)
    assert len(levels) == 3
    assert levels[-1] == {n: 2 for n in levels[-1]}
    assert levels[0] == {n: 0 for n in levels[0]}
