"""QuantizedTensorCodec (TorchQuantizedEntropyCoder parity): data_range /
precision quantization + uniform / adaptive / prob / logit prior formats."""

import numpy as np
import pytest

from cbench_basic_tpu.codecs.quantized_coder import QuantizedTensorCodec


def test_integer_data_lossless_roundtrip():
    codec = QuantizedTensorCodec(data_range=(0, 255), precision=8,
                                 prior="adaptive")
    data = np.random.RandomState(0).randint(0, 256, (16, 16, 3),
                                            dtype=np.uint8)
    stream = codec.compress(data)
    rec = codec.decompress(stream)
    np.testing.assert_array_equal(rec, data)
    assert rec.dtype == data.dtype


def test_float_quantized_roundtrip_error_bound():
    codec = QuantizedTensorCodec(data_range=(-1.0, 1.0), precision=10,
                                 prior="uniform")
    data = np.random.RandomState(1).uniform(-1, 1, (8, 8, 4)).astype(
        np.float32)
    rec = codec.decompress(codec.compress(data))
    assert rec.shape == data.shape
    # max error bounded by half a quantization step
    step = 2.0 / (2 ** 10 - 1)
    assert float(np.abs(rec - data).max()) <= step / 2 + 1e-6


def test_adaptive_prior_beats_uniform_on_skewed_data():
    rs = np.random.RandomState(2)
    data = np.clip(rs.zipf(2.0, (32, 32, 2)), 0, 255).astype(np.uint8)
    adaptive = QuantizedTensorCodec(data_range=(0, 255), precision=8,
                                    prior="adaptive")
    uniform = QuantizedTensorCodec(data_range=(0, 255), precision=8,
                                   prior="uniform")
    sa = adaptive.compress(data)
    su = uniform.compress(data)
    np.testing.assert_array_equal(adaptive.decompress(sa), data)
    assert len(sa) < len(su)  # histogram header included, still smaller


def test_fixed_prob_and_logit_priors():
    K = 16
    pmf = np.full((3, K), 1.0)
    pmf[:, 0] = 50.0  # symbol 0 is cheap
    codec_p = QuantizedTensorCodec(data_range=(0, K - 1), precision=4,
                                   prior=pmf / pmf.sum(-1, keepdims=True))
    codec_l = QuantizedTensorCodec(data_range=(0, K - 1), precision=4,
                                   prior=np.log(pmf), from_logits=True)
    data = np.zeros((8, 8, 3), np.int32)
    s_p, s_l = codec_p.compress(data), codec_l.compress(data)
    np.testing.assert_array_equal(codec_p.decompress(s_p), data)
    np.testing.assert_array_equal(codec_l.decompress(s_l), data)
    # all-zeros under a zero-favoring prior codes much below 4 bits/symbol
    assert len(s_p) * 8 < data.size * 2

    with pytest.raises(ValueError):
        QuantizedTensorCodec(precision=4, prior=np.ones((3, 7)))
