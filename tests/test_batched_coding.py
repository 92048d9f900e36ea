"""Batched multi-image TPU coding mode: one fused dispatch per batch.

The batched container must reconstruct bit-identically to the per-image
TPU mode (same tables, same group padding convention), and fall back to
per-image streams for mixed shapes or non-TPU codecs.
"""

import jax
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph


def _codec(**kw):
    model, specs = build_topogroup_hyperprior_graph(
        N=24, M=16, context_channels=32, y_stride=8, **kw)
    codec = LatentGraphCodec(model, specs, alignment=32, coding_mode="tpu",
                             num_lanes=64)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    codec.update_state()
    return codec


def test_batched_matches_per_image():
    codec = _codec()
    ds = SyntheticImageDataset(num_items=3, height=32, width=40)
    imgs = [ds.get_data_at(i) for i in range(3)]

    stream_b = codec.compress_batch(imgs)
    assert stream_b[0] == codec.MODE_TPU_BATCH
    recs_b = codec.decompress_batch(stream_b)
    assert len(recs_b) == 3

    for img, rec_b in zip(imgs, recs_b):
        rec_single = codec.decompress(codec.compress(img))
        np.testing.assert_array_equal(rec_b, rec_single)

    # batched stream is smaller than the sum of singles (shared headers)
    singles = sum(len(codec.compress(im)) for im in imgs)
    assert len(stream_b) < singles + 64


def test_batched_mixed_shapes_falls_back():
    codec = _codec()
    a = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    b = SyntheticImageDataset(1, 32, 64).get_data_at(0)
    stream = codec.compress_batch([a, b])
    assert stream[0] == codec.MODE_COMPAT  # per-image fallback container
    recs = codec.decompress_batch(stream)
    assert recs[0].shape == a.shape and recs[1].shape == b.shape


def test_batched_elic_pattern():
    codec = _codec(pattern="elic", num_channel_groups=2)
    ds = SyntheticImageDataset(num_items=2, height=32, width=32)
    imgs = [ds.get_data_at(i) for i in range(2)]
    recs = codec.decompress_batch(codec.compress_batch(imgs))
    for img, rec in zip(imgs, recs):
        np.testing.assert_array_equal(
            rec, codec.decompress(codec.compress(img)))
