"""TPU-native fused coding mode: the single-dispatch interleaved-rANS path
must reconstruct EXACTLY the same image as the bit-exact compat path."""

import jax
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph


@pytest.mark.parametrize("pattern,ncg", [("checkerboard", 1), ("elic", 4)])
def test_tpu_mode_matches_compat(pattern, ncg):
    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, pattern=pattern, num_channel_groups=ncg,
        context_channels=32)
    codec = LatentGraphCodec(model, specs, coding_mode="tpu", num_lanes=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    assert codec._tpu_ok

    img = SyntheticImageDataset(1, 64, 96).get_data_at(0)

    stream_tpu = codec.compress(img)
    assert stream_tpu[0] == codec.MODE_TPU
    rec_tpu = codec.decompress(stream_tpu)

    codec.coding_mode = "compat"
    stream_compat = codec.compress(img)
    assert stream_compat[0] == codec.MODE_COMPAT
    rec_compat = codec.decompress(stream_compat)

    # Same quantized latents -> bit-identical reconstructions.
    np.testing.assert_array_equal(rec_tpu, rec_compat)

    # Both modes decode regardless of the codec's current setting
    # (mode byte routes).
    np.testing.assert_array_equal(codec.decompress(stream_tpu), rec_tpu)
    codec.coding_mode = "tpu"
    np.testing.assert_array_equal(codec.decompress(stream_compat), rec_compat)

    # Determinism of the tpu stream.
    assert codec.compress(img) == stream_tpu


def test_tpu_mode_stream_overhead_reasonable():
    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, pattern="checkerboard", context_channels=32)
    codec = LatentGraphCodec(model, specs, coding_mode="tpu", num_lanes=16)
    codec.init_params(jax.random.PRNGKey(1), input_shape=(1, 64, 64, 3))
    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    tpu_len = len(codec.compress(img))
    codec.coding_mode = "compat"
    compat_len = len(codec.compress(img))
    # Interleaved lanes cost ~8 bytes/lane flush + padding duplicates.
    assert tpu_len < compat_len + 16 * 8 * 2 + 1024
