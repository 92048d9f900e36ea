"""Aux components: AR transforms, GeneralCodec/preprocessors, Huffman/rANS
byte codecs, BufferedRansEncoder compat, BasicTrainer, schedulers."""

import numpy as np
import pytest

from cbench_basic_tpu.coding.ar_transforms import (
    THREE_WAY_IMAGE_OFFSETS,
    ar_mean_forward,
    ar_mean_inverse,
)
from cbench_basic_tpu.codecs.entropy_codecs import (
    BufferedRansDecoder,
    BufferedRansEncoder,
    HuffmanCodec,
    RansByteCodec,
)
from cbench_basic_tpu.codecs.general_codec import (
    Bytes2ArrayPreprocessor,
    GeneralCodec,
    ThreeWayARImagePredictor,
)
from cbench_basic_tpu.codecs.lossless import ZlibCodec


def test_ar_mean_transform_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (1, 32, 24, 3)).astype(np.int32)
    res = ar_mean_forward(img, THREE_WAY_IMAGE_OFFSETS)
    assert res.shape == img.shape
    rec = ar_mean_inverse(res, THREE_WAY_IMAGE_OFFSETS)
    np.testing.assert_array_equal(rec, img)
    # Residuals of smooth content are smaller than raw values.
    smooth = np.cumsum(np.ones((1, 32, 32)), axis=1).astype(np.int32)
    r = ar_mean_forward(smooth, [[0, -1], [0, 0], [0, -1]])
    assert np.abs(r[0, 4:, 4:]).mean() < smooth[0, 4:, 4:].mean()


def test_general_codec_with_ar_predictor():
    rng = np.random.default_rng(1)
    yy = np.linspace(0, 200, 64)[:, None]
    img = (yy + np.linspace(0, 55, 48)[None, :]).astype(np.uint8)
    img = np.repeat(img[..., None], 3, -1)
    codec = GeneralCodec(ZlibCodec(), preprocessor=ThreeWayARImagePredictor())
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    np.testing.assert_array_equal(rec, img)
    # Prediction should help on smooth images vs plain zlib.
    assert len(stream) < len(ZlibCodec().compress(img)) * 1.1


def test_bytes2array_preprocessor():
    p = Bytes2ArrayPreprocessor()
    arr, _ = p.preprocess(b"hello world")
    assert arr.dtype == np.uint8 and arr.size == 11
    assert p.postprocess(arr) == b"hello world"


@pytest.mark.parametrize("codec_cls,kwargs", [
    (RansByteCodec, {}),
    (RansByteCodec, {"coder": "tans"}),
    (HuffmanCodec, {}),
])
def test_byte_entropy_codecs(codec_cls, kwargs):
    rng = np.random.default_rng(2)
    # Skewed distribution -> compressible.
    data = rng.choice(np.arange(256), p=np.r_[np.full(16, 0.05), np.full(240, 0.2 / 240)],
                      size=20000).astype(np.uint8).tobytes()
    codec = codec_cls(**kwargs)
    stream = codec.compress(data)
    assert codec.decompress(stream) == data
    assert len(stream) < len(data)


def test_buffered_rans_encoder_compat():
    from cbench_basic_tpu.coding.rans import pmf_to_quantized_cdf
    rng = np.random.default_rng(3)
    pmf = rng.random(16).astype(np.float32)
    pmf /= pmf.sum()
    cdf = np.array([pmf_to_quantized_cdf(list(pmf) + [1e-8], 16)], np.int32)
    sizes = np.array([cdf.shape[1]], np.int32)
    offsets = np.zeros(1, np.int32)

    enc = BufferedRansEncoder()
    chunks = []
    for n in (100, 57):
        data = rng.integers(0, 16, n).astype(np.int32)
        idx = np.zeros(n, np.int32)
        enc.encode_with_indexes_np(data, idx, cdf, sizes, offsets)
        chunks.append((data, idx))
    stream = enc.flush()
    dec = BufferedRansDecoder(stream, num_chunks=2)
    for data, idx in chunks:
        np.testing.assert_array_equal(dec.decode_next(idx, cdf, sizes, offsets),
                                      data)


def test_basic_trainer_roundtrip(tmp_path):
    from cbench_basic_tpu.train.basic_trainer import BasicTrainer, TrainableInterface

    class HistogramModel(TrainableInterface):
        def __init__(self):
            self.counts = np.zeros(256, np.int64)

        def train_full(self, dataloader):
            for d in dataloader:
                self.counts += np.bincount(np.asarray(d).ravel(), minlength=256)

        def get_parameters(self):
            return self.counts

        def load_parameters(self, p):
            self.counts = p

    data = [np.full(10, 7, np.uint8), np.full(5, 7, np.uint8)]
    trainer = BasicTrainer(dataloader=data, output_dir=str(tmp_path))
    m = HistogramModel()
    trainer.train_module(m)
    assert m.counts[7] == 15
    assert (tmp_path / "params.pkl").exists()
    # Resume: loads instead of retraining.
    m2 = HistogramModel()
    trainer.train_module(m2)
    assert m2.counts[7] == 15


def test_schedulers():
    from cbench_basic_tpu.train.schedulers import (
        ParamScheduler, exponential_anneal, step_decay, warmup_cosine)
    s = warmup_cosine(1e-3, 10, 100)
    assert s(0) == 0.0 and abs(s(10) - 1e-3) < 1e-9 and s(100) < 1e-4
    s = step_decay(1.0, 10, 0.5)
    assert s(0) == 1.0 and s(10) == 0.5 and s(25) == 0.25
    ps = ParamScheduler("gs_temp", exponential_anneal(1.0, 0.1, 100))
    assert abs(ps.value(0) - 1.0) < 1e-9
    assert abs(ps.value(100) - 0.1) < 1e-9
    assert 0.1 < ps.value(50) < 1.0
