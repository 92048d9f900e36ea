"""Slimmable layers, PGM edges, FLOPs accounting, complexity levels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.builders import build_basic_scalable_graph
from cbench_basic_tpu.nn.slimmable import (
    PGMSlimmableEdge,
    SlimmableAnalysisTransform,
    SlimmableConv,
    SlimmableSynthesisTransform,
)

WIDTHS = (8, 12, 16)


def test_slimmable_conv_levels():
    conv = SlimmableConv(WIDTHS, max_in=3)
    x = jnp.ones((1, 16, 16, 3))
    params = conv.init(jax.random.PRNGKey(0), x, 2)["params"]
    for level, w in enumerate(WIDTHS):
        out = conv.apply({"params": params}, x, level)
        assert out.shape == (1, 8, 8, w)
    # Smaller level = prefix slice of the max-width computation.
    f0 = conv.flops((1, 16, 16, 3), 0)
    f2 = conv.flops((1, 16, 16, 3), 2)
    assert f0 < f2


def test_slimmable_transform_stack_shapes():
    ga = SlimmableAnalysisTransform(WIDTHS, M=20)
    x = jnp.ones((1, 64, 64, 3))
    params = ga.init(jax.random.PRNGKey(0), x, 0)["params"]
    for level in range(3):
        y = ga.apply({"params": params}, x, level)
        assert y.shape == (1, 4, 4, 20)  # output width fixed at M
    gs = SlimmableSynthesisTransform(WIDTHS, M=20)
    yp = gs.init(jax.random.PRNGKey(0), y, 0)["params"]
    for level in range(3):
        x_hat = gs.apply({"params": yp}, y, level)
        assert x_hat.shape == (1, 64, 64, 3)


def test_pgm_edge_modes():
    edge = PGMSlimmableEdge(SlimmableAnalysisTransform(WIDTHS, M=20),
                            num_levels=3)
    x = jnp.ones((1, 64, 64, 3))
    params = edge.init(jax.random.PRNGKey(0), x, level=0)["params"]

    out_hard, flops_hard = edge.apply({"params": params}, x, level=1)
    assert out_hard.shape == (1, 4, 4, 20)
    assert isinstance(flops_hard, float) and flops_hard > 0

    out_soft, flops_soft = edge.apply({"params": params}, x, soft=True)
    assert out_soft.shape == out_hard.shape
    # Uniform logits -> expected flops = mean of per-level flops.
    per_level = [edge.transform.flops(x.shape, l) for l in range(3)]
    assert abs(float(flops_soft) - np.mean(per_level)) / np.mean(per_level) < 1e-5

    # Weighted mixture with one-hot == hard path output.
    w = jnp.array([0.0, 1.0, 0.0])
    out_w, _ = edge.apply({"params": params}, x, weights=w)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_hard),
                               rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def basic_codec():
    model, specs, levels = build_basic_scalable_graph(
        N=12, M=16, widths=(8, 12, 16), pattern="checkerboard",
        num_channel_groups=1, context_channels=32,
        flops_weight=1e-10, flops_limit=0.0)
    codec = LatentGraphCodec(model, specs, complexity_levels=levels)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return codec


def test_basic_graph_training_forward(basic_codec):
    codec = basic_codec
    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "flops" in metrics and float(metrics["flops"]) > 0
    assert "loss_flops" in metrics


def test_basic_graph_complexity_levels_roundtrip(basic_codec):
    codec = basic_codec
    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    assert codec.num_complex_levels == 3
    sizes = {}
    for level in range(codec.num_complex_levels):
        codec.set_complex_level(level)
        stream = codec.compress(img)
        rec = codec.decompress(stream)
        assert rec.shape == img.shape
        sizes[level] = len(stream)
    # All levels must produce valid (decodable) streams; sizes differ because
    # different widths give different latents.
    assert len(set(sizes.values())) >= 1


def test_basic_graph_grad_flows_to_pgm_logits(basic_codec):
    codec = basic_codec
    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0

    def loss(p):
        l, _ = codec.loss_fn(p, x, jax.random.PRNGKey(2))
        return l

    grads = jax.grad(loss)(codec.params)
    # The soft mixture must backprop into every edge's pgm logits.
    for edge in ("x_y", "y_z", "z_y", "y_x"):
        g = grads["edges_" + edge]["pgm_logits"]
        assert np.abs(np.asarray(g)).sum() > 0
