"""Codec-level on-device encode (device_encode=True, the default).

The fully-fused batched encode (NN + quantization + on-device rans32,
tpu_encode_coded_pass) must produce a stream BYTE-IDENTICAL to the
host-coder path — the format doesn't change, only where the entropy
coding runs and how many bytes cross the link.
"""
import jax
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph


def _codec(device_encode, pattern="elic", ncg=4, num_lanes=64, levels=False):
    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, pattern=pattern, num_channel_groups=ncg,
        context_channels=32)
    codec = LatentGraphCodec(model, specs, coding_mode="tpu",
                             num_lanes=num_lanes,
                             device_encode=device_encode)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec.update_state()
    return codec


@pytest.mark.parametrize("pattern,ncg", [("checkerboard", 1), ("elic", 4)])
def test_device_encode_stream_is_byte_identical(pattern, ncg):
    imgs = [SyntheticImageDataset(2, 64, 96).get_data_at(i) for i in range(2)]
    dev = _codec(True, pattern, ncg)
    host = _codec(False, pattern, ncg)
    s_dev = dev.compress_batch(imgs)
    s_host = host.compress_batch(imgs)
    assert s_dev == s_host
    recs = dev.decompress_batch(s_dev)
    recs_h = host.decompress_batch(s_host)
    for a, b, im in zip(recs, recs_h, imgs):
        assert a.shape == im.shape
        np.testing.assert_array_equal(a, b)


def test_device_encode_profiles_stream_pull_not_symbols():
    imgs = [SyntheticImageDataset(2, 64, 64).get_data_at(i) for i in range(2)]
    dev = _codec(True)
    dev.compress_batch(imgs)
    prof = dev.collect_profile()
    assert "profile_encode_stream_pull" in prof
    assert "profile_encode_host_rans" not in prof


def test_device_encode_single_image_byte_identical():
    """The single-image path (adaptive per-stream lane counts) also codes
    on device and must match the host coder byte for byte."""
    img = SyntheticImageDataset(1, 96, 64).get_data_at(0)
    dev = _codec(True)
    host = _codec(False)
    s_dev = dev.compress(img)
    s_host = host.compress(img)
    assert s_dev == s_host
    prof = dev.collect_profile()
    assert "profile_encode_stream_pull" in prof
    np.testing.assert_array_equal(dev.decompress(s_dev),
                                  host.decompress(s_host))


def test_device_encode_variable_rate_levels_match_host():
    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, pattern="elic", num_channel_groups=2,
        context_channels=32, num_rate_levels=3)
    imgs = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]
    streams = {}
    for de in (True, False):
        codec = LatentGraphCodec(model, specs, coding_mode="tpu",
                                 num_lanes=64, device_encode=de)
        codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
        codec.update_state()
        codec.set_rate_level(1)
        streams[de] = codec.compress_batch(imgs)
        rec = codec.decompress_batch(streams[de])[0]
        assert rec.shape == imgs[0].shape
    assert streams[True] == streams[False]
