"""Gain-vector variable rate (autoencoder v2 parity): one model, multiple
rate points via learned channel gains; fractional levels interpolate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph


def _vr_codec(**kw):
    model, specs = build_topogroup_hyperprior_graph(
        N=24, M=16, context_channels=32, y_stride=8, num_rate_levels=3, **kw)
    codec = LatentGraphCodec(model, specs, alignment=32, coding_mode="tpu",
                             num_lanes=64)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    codec.update_state()
    return codec


def test_rate_levels_change_rate_monotonically():
    codec = _vr_codec()
    assert codec.num_rate_levels == 3
    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    sizes = []
    for lvl in range(3):
        codec.set_rate_level(lvl)
        stream = codec.compress(img)
        rec = codec.decompress(stream)
        assert rec.shape == img.shape
        sizes.append(len(stream))
    # the log-linear gain init spreads rates: level 0 (gain < 1) codes
    # smaller than level 2 (gain > 1) even before training
    assert sizes[0] < sizes[2], sizes


def test_fractional_level_roundtrip_between_neighbors():
    codec = _vr_codec()
    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    codec.set_rate_level(0.5)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    codec.set_rate_level(0)
    s0 = len(codec.compress(img))
    codec.set_rate_level(1)
    s1 = len(codec.compress(img))
    codec.set_rate_level(0.5)
    smid = len(codec.compress(img))
    assert min(s0, s1) - 64 <= smid <= max(s0, s1) + 64


def test_compat_and_tpu_modes_agree_per_level():
    codec = _vr_codec()
    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    for lvl in (0, 2):
        codec.set_rate_level(lvl)
        rec_tpu = codec.decompress(codec.compress(img))
        codec.coding_mode = "compat"
        rec_c = codec.decompress(codec.compress(img))
        codec.coding_mode = "tpu"
        np.testing.assert_array_equal(rec_tpu, rec_c)


def test_training_forward_with_vrlevel_kwarg():
    codec = _vr_codec()
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    loss, metrics = codec.loss_fn(
        codec.params, x, jax.random.PRNGKey(1),
        node_kwargs={"y": {"vrlevel": jnp.float32(1.0)},
                     "x": {"lmbda": jnp.float32(0.02)}})
    assert np.isfinite(float(loss))
    # gains receive gradient
    g = jax.grad(lambda p: codec.loss_fn(
        p, x, jax.random.PRNGKey(2),
        node_kwargs={"y": {"vrlevel": jnp.float32(1.0)}})[0])(codec.params)
    gn = float(jnp.abs(g["node_coders_y"]["rate_gains"]).sum())
    assert np.isfinite(gn) and gn > 0


def test_benchmark_iterates_rate_levels(tmp_path):
    from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark

    codec = _vr_codec()
    bench = BasicCompressionBenchmark(
        codec=codec, dataloader=SyntheticImageDataset(1, 32, 32),
        output_dir=str(tmp_path))
    metrics = bench.run_testing()
    assert any(k.startswith("vrlevel0_") for k in metrics)
    assert any(k.startswith("vrlevel2_") for k in metrics)
