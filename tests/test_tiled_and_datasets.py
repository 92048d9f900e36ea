"""Tiled inference + non-image datasets."""

import numpy as np

from cbench_basic_tpu.codecs.pycodecs import PILImageCodec
from cbench_basic_tpu.codecs.tiled import TiledCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.data.extra_datasets import (
    BinaryFileDataset,
    TableDataset,
    TensorDataset,
)


def test_tiled_codec_lossless_roundtrip():
    img = SyntheticImageDataset(1, 300, 500).get_data_at(0)  # non-multiple
    codec = TiledCodec(PILImageCodec("PNG"), tile=256)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    np.testing.assert_array_equal(rec, img)


def test_tiled_codec_neural_4k_shapes():
    """Tiling turns a big image into identical tile shapes (one compile)."""
    import jax
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph import build_hyperprior_graph

    model, specs = build_hyperprior_graph(N=8, M=12)
    inner = LatentGraphCodec(model, specs)
    inner.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec = TiledCodec(inner, tile=128)

    img = SyntheticImageDataset(1, 256, 320).get_data_at(0)
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape


def test_tiled_batched_matches_per_tile():
    """Batched tile groups (one fused dispatch per size group) must decode
    to exactly the same pixels as the per-tile stream layout."""
    import jax
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph import build_hyperprior_graph

    model, specs = build_hyperprior_graph(N=8, M=12)
    inner = LatentGraphCodec(model, specs)
    inner.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    img = SyntheticImageDataset(1, 192, 320).get_data_at(0)

    recs = {}
    for batched in (False, True):
        codec = TiledCodec(inner, tile=128, batched=batched)
        stream = codec.compress(img)
        rec = codec.decompress(stream)
        assert rec.shape == img.shape
        recs[batched] = rec
    np.testing.assert_array_equal(recs[False], recs[True])


def test_extra_datasets(tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02" * 100)
    (tmp_path / "b.bin").write_bytes(b"hello")
    ds = BinaryFileDataset(str(tmp_path))
    assert len(ds) == 2
    assert ds.get_data_at(1) == b"hello"

    t = TensorDataset(np.arange(12).reshape(3, 4))
    assert len(t) == 3 and t.get_data_at(2)[0] == 8

    (tmp_path / "t.csv").write_text("a,b\n1,2\n3,4\n")
    tab = TableDataset(str(tmp_path / "t.csv"))
    assert len(tab) == 3 and tab.get_data_at(1) == b"1,2"
