"""LZ77 codec/preprocessor + external-binary codec wrapper tests."""

import os
import stat

import numpy as np
import pytest

from cbench_basic_tpu.codecs.lz77 import (
    LZ77Codec,
    lz77_detokenize,
    lz77_tokenize,
    train_lz77_dictionary,
)


def test_lz77_roundtrip_and_compression():
    data = (b"the quick brown fox jumps over the lazy dog. " * 200
            + os.urandom(500))
    tokens = lz77_tokenize(data)
    assert lz77_detokenize(tokens) == data
    assert len(tokens) < len(data) * 0.5  # repetitive content compresses

    # Overlapping match (RLE-style).
    rle = b"a" * 1000
    assert lz77_detokenize(lz77_tokenize(rle)) == rle

    # With an entropy-coding inner stage.
    from cbench_basic_tpu.codecs.lossless import ZlibCodec
    codec = LZ77Codec(inner=ZlibCodec())
    assert codec.decompress(codec.compress(data)) == data


def test_lz77_dictionary():
    samples = [b"GET /index.html HTTP/1.1\r\nHost: example.com\r\n" * 4
               for _ in range(8)]
    d = train_lz77_dictionary(samples, dict_size=256)
    assert 0 < len(d) <= 256
    msg = b"GET /index.html HTTP/1.1\r\nHost: example.org\r\n"
    with_dict = LZ77Codec(dictionary=d)
    without = LZ77Codec()
    assert with_dict.decompress(with_dict.compress(msg)) == msg
    assert len(with_dict.compress(msg)) <= len(without.compress(msg))


def test_external_binary_codec_with_fake_binary(tmp_path):
    """Drive the subprocess wrapper with a fake 'codec' (copies files)."""
    from cbench_basic_tpu.codecs.binary_codec import ExternalBinaryCodec

    fake = tmp_path / "fakecodec"
    fake.write_text("#!/bin/sh\ncp \"$1\" \"$2\"\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    os.environ["PATH"] = f"{tmp_path}:{os.environ['PATH']}"

    codec = ExternalBinaryCodec(
        ["fakecodec", "{input}", "{output}"],
        ["fakecodec", "{input}", "{output}"],
        compressed_suffix=".png")
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    rec = codec.decompress(codec.compress(img))
    np.testing.assert_array_equal(rec, img)


def test_external_binary_codec_missing_binary():
    from cbench_basic_tpu.codecs.binary_codec import bpg_codec
    with pytest.raises(FileNotFoundError):
        bpg_codec()
