"""Greedy complexity search tests."""

import jax
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.builders import build_basic_scalable_graph
from cbench_basic_tpu.graph.complexity_search import (
    config_flops,
    post_training_complexity_search,
)


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
