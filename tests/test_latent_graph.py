"""Latent-graph engine + topogroup coder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import (
    build_hyperprior_graph,
    build_topogroup_hyperprior_graph,
    topo_group_map,
)


def test_topo_group_map_patterns():
    gmap, n = topo_group_map("checkerboard", 4, 4, 8)
    assert n == 2 and gmap.shape == (4, 4, 8)
    assert int(gmap[0, 0, 0]) == 0 and int(gmap[0, 1, 0]) == 1
    gmap, n = topo_group_map("scanline", 6, 4, 8)
    assert n == 6 and (np.asarray(gmap[3]) == 3).all()
    gmap, n = topo_group_map("raster2x2", 4, 4, 8)
    assert n == 4
    gmap, n = topo_group_map("channelwise", 4, 4, 8, num_channel_groups=4)
    assert n == 4 and int(gmap[0, 0, 7]) == 3
    gmap, n = topo_group_map("elic", 4, 4, 10, num_channel_groups=5)
    assert n == 10
    # ELIC: group = 2*channel_group + spatial parity.
    assert int(gmap[0, 0, 9]) == 8 and int(gmap[0, 1, 9]) == 9


@pytest.fixture(scope="module")
def hyper_graph_codec():
    model, specs = build_hyperprior_graph(N=16, M=24, lmbda=0.01)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return codec


def test_graph_forward_loss(hyper_graph_codec):
    codec = hyper_graph_codec
    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert {"bpp", "loss_distortion", "psnr"} <= set(metrics)
    out = codec.eval_forward_fn(codec.params, x)
    assert set(out["likelihoods"]) == {"y", "z"}
    assert out["x_hat"].shape == x.shape


def test_graph_codec_roundtrip(hyper_graph_codec):
    codec = hyper_graph_codec
    img = SyntheticImageDataset(1, 80, 96).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape and rec.dtype == np.uint8
    assert len(stream) < img.nbytes
    assert codec.compress(img) == stream  # deterministic


def test_graph_matches_flat_hyperprior_structure(hyper_graph_codec):
    """The graph-engine hyperprior must produce self-consistent RD behavior:
    eval likelihoods bound the real bitstream length from below."""
    codec = hyper_graph_codec
    img = SyntheticImageDataset(3, 64, 64).get_data_at(2)
    x = jnp.asarray(img, jnp.float32)[None] / 255.0
    out = codec.eval_forward_fn(codec.params, x)
    est_bits = float(sum(jnp.sum(-jnp.log2(l)) for l in out["likelihoods"].values()))
    stream = codec.compress(img)
    real_bits = 8 * len(stream)
    # Real stream carries headers + integer-CDF overhead; must be close.
    assert real_bits > 0.8 * est_bits
    assert real_bits < 2.0 * est_bits + 2048


@pytest.mark.parametrize("pattern,ncg", [("checkerboard", 1), ("elic", 4)])
def test_topogroup_codec_roundtrip(pattern, ncg):
    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, lmbda=0.01, pattern=pattern, num_channel_groups=ncg,
        context_channels=32)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert len(stream) < img.nbytes


def test_topogroup_encode_decode_symbol_exactness():
    """Decode must reconstruct the exact y_hat buffer the encoder built —
    the AR chain breaks if even one symbol differs."""
    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, pattern="checkerboard", context_channels=32)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec.update_state()

    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    x, _ = codec._prep_image(img)
    values = codec._infer_fn(codec.params, x)

    # Encode z then y by hand, capturing the encoder-side y_hat.
    decoded = {}
    prior_z = codec._prior_fn(codec.params, "z", decoded)
    z_stream, z_hat = codec._encode_node("z", values["z"], prior_z)
    decoded["z"] = z_hat
    prior_y = codec._prior_fn(codec.params, "y", decoded)
    coder = codec.model.node_coders["y"]
    y_stream, y_hat_enc = coder.host_encode(codec, "y", values["y"], prior_y,
                                            codec._coders["y"])
    y_hat_dec = coder.host_decode(codec, "y", y_stream, prior_y,
                                  values["y"].shape, codec._coders["y"])
    np.testing.assert_array_equal(np.asarray(y_hat_enc), np.asarray(y_hat_dec))


def test_graph_trains():
    from cbench_basic_tpu.data.datasets import BatchedPatchLoader
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", context_channels=16)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    ds = SyntheticImageDataset(num_items=2, height=64, width=64)
    loader = BatchedPatchLoader(ds, batch_size=4, patch_size=64, steps_per_epoch=4)
    trainer = NeuralCodecTrainer(dataloader=loader, num_epochs=1,
                                 data_parallel=False, log_every=2)
    x0 = jnp.asarray(next(iter(loader)))
    before, _ = codec.loss_fn(codec.params, x0, jax.random.PRNGKey(3))
    trainer.train_module(codec)
    after, _ = codec.loss_fn(codec.params, x0, jax.random.PRNGKey(3))
    assert float(after) < float(before)


def test_forward_estimate_bitlen(hyper_graph_codec):
    """NN-forward-only rate estimate: within container+CDF overhead of the
    real bitstream length (parity: forward_estimate_bitlen)."""
    codec = hyper_graph_codec
    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    est_bits = codec.forward_estimate_bitlen(img)
    real_bits = len(codec.compress(img)) * 8
    assert est_bits > 0
    # Real stream = estimate + fixed overhead (headers, per-node flush,
    # integer-CDF quantization); must never be dramatically below estimate.
    assert real_bits > 0.6 * est_bits
    assert real_bits < 2.0 * est_bits + 1024


def test_raster_serial_baseline_roundtrip():
    """Full per-pixel serial AR (Minnen joint-AR baseline): H*W decode
    steps; tiny latent keeps it fast. Validates the serial reference path
    the topogroup design replaces."""
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=8, pattern="raster", context_channels=16)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)  # 4x4 latent = 16 steps
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream
