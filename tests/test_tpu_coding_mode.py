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


def test_sparse_lane_packing_roundtrip_and_size():
    """pack_lane_words stores only each lane's counted words (plus a u16
    count per lane); the legacy dense layout is still readable."""
    import struct

    from cbench_basic_tpu.coding.rans import pack_lane_words, unpack_lane_words

    rng = np.random.default_rng(3)
    L, W = 64, 40
    counts = rng.integers(2, W, L).astype(np.int32)
    words = np.zeros((L, W), np.uint32)
    for l in range(L):
        words[l, :counts[l]] = rng.integers(1, 2 ** 32, counts[l],
                                            dtype=np.uint32)
    packed = pack_lane_words(words, counts)
    # sparse: header + 2B/lane counts + 4B per COUNTED word only
    assert len(packed) == 4 + 2 * L + 4 * int(counts.sum())
    got_words, got_counts = unpack_lane_words(packed)
    np.testing.assert_array_equal(got_counts, counts)
    maxc = int(counts.max())
    np.testing.assert_array_equal(got_words[:, :maxc], words[:, :maxc])

    # legacy dense stream (max_words field > 0) still unpacks
    dense = (struct.pack("<HH", L, W) + counts.astype("<u2").tobytes()
             + words.astype("<u4").tobytes())
    got_words2, got_counts2 = unpack_lane_words(dense)
    np.testing.assert_array_equal(got_counts2, counts)
    np.testing.assert_array_equal(got_words2, words)


def test_single_image_adaptive_lanes_and_sparse_stream():
    """Single-image tpu streams pick an adaptive lane count (recorded in
    the stream header — NOT the batched num_lanes default) and store only
    counted words: total length must satisfy the sparse size equation
    instead of the dense (L, max_words) matrix that made every same-size
    image cost identical bytes."""
    import struct

    from cbench_basic_tpu.utils.bytes_ops import split_merged_bytes

    model, specs = build_topogroup_hyperprior_graph(
        N=12, M=16, pattern="checkerboard", context_channels=32)
    codec = LatentGraphCodec(model, specs, coding_mode="tpu", num_lanes=2048)
    codec.init_params(jax.random.PRNGKey(2), input_shape=(1, 64, 64, 3))
    img = SyntheticImageDataset(2, 64, 64).get_data_at(1)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape

    # header: mode byte + encoded shape; then two merged lane packs
    from cbench_basic_tpu.utils.bytes_ops import decode_shape
    (_, _), hdr = decode_shape(stream[1:])
    z_pack, y_pack = split_merged_bytes(stream[1 + hdr:], num_segments=2)
    dense_total = 0
    for pack in (z_pack, y_pack):
        L, mw = struct.unpack("<HH", pack[:4])
        # sparse markers: 0 = u32 words (rans64), 1 = u16 words (rans32 v2,
        # the default); dense legacy layouts store max_words >= 2 here.
        assert mw in (0, 1), "sparse marker"
        wsize = 2 if mw == 1 else 4
        assert L == 128, "adaptive lanes for a tiny image, not num_lanes"
        counts = np.frombuffer(pack[4:4 + 2 * L], "<u2").astype(np.int64)
        assert len(pack) == 4 + 2 * L + wsize * int(counts.sum())
        dense_total += 4 + 2 * 2048 + wsize * 2048 * int(counts.max())
    # the old layout at num_lanes=2048 would have cost far more
    assert len(stream) < dense_total / 4
    assert codec._adaptive_lanes(4 * 4 * 16) == 128
