"""Per-file codec config library: pycodecs / zstd_wrapper / binary_codecs
(reference configs/codecs/{pycodecs,zstd_wrapper,binary_codecs}/ +
pickle.py + py_zlib.py) and the new lossless classes (BrotliCodec gate,
PickleCodec, self-trainable ZstdDictCodec)."""

import os

import numpy as np
import pytest

from cbench_basic_tpu.config.import_utils import (
    import_all_config_from_dir,
    import_config_from_file,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
CODECS = os.path.join(REPO, "configs", "codecs")


def test_pycodecs_dir_roundtrips():
    cfgs = import_all_config_from_dir(os.path.join(CODECS, "pycodecs"))
    assert len(cfgs) == 11
    img = (np.random.default_rng(0).random((32, 48, 3)) * 255).astype(
        np.uint8)
    data = np.frombuffer(b"abcabcabc" * 100, np.uint8)
    for name, cfg in sorted(cfgs.items()):
        if name == "flif":
            with pytest.raises(FileNotFoundError):
                cfg.build_class()  # binary absent in this image
            continue
        codec = cfg.build_class()
        if name == "brotli":
            with pytest.raises(ModuleNotFoundError):
                codec.compress(data)  # module not baked in
            continue
        x = img if ("pil" in name or name in ("png", "webp")) else data
        out = np.asarray(codec.decompress(codec.compress(x)))
        assert out.shape == np.asarray(x).shape
        if name.startswith(("png", "zlib", "zstd")):
            assert np.array_equal(out, np.asarray(x)), name  # lossless


def test_zstd_wrapper_dir():
    cfgs = import_all_config_from_dir(os.path.join(CODECS, "zstd_wrapper"))
    assert len(cfgs) == 6
    payload = b"the quick brown fox jumps over the lazy dog " * 40
    arr = np.frombuffer(payload, np.uint8)
    for name, cfg in sorted(cfgs.items()):
        codec = cfg.build_class()
        if "lz77seq" in name:
            out = bytes(codec.decompress(codec.compress(payload)))
            assert out == payload, name
        else:
            out = np.asarray(codec.decompress(codec.compress(arr)))
            assert np.array_equal(out, arr), name


def test_zstd_dict_self_training_improves_ratio():
    cfg = import_config_from_file(
        os.path.join(CODECS, "zstd_wrapper", "dict.py"))
    rng = np.random.default_rng(0)
    words = [bytes(rng.integers(97, 110, 7)) for _ in range(32)]
    samples = [b" ".join(words[int(i)] for i in rng.integers(0, 32, 40))
               for _ in range(64)]
    cfg.update_slot_params(dict_size=4096, train_dataloader=samples)
    codec = cfg.build_class()
    assert codec.is_trainable
    plain = len(codec.compress(samples[0]))
    codec.train_self()
    trained = len(codec.compress(samples[0]))
    rt = codec.decompress(codec.compress(samples[0]))
    assert bytes(np.asarray(rt).tobytes()) == samples[0]
    assert trained < plain  # dictionary helps on tiny samples


def test_binary_codecs_and_toplevel():
    bpg = import_config_from_file(
        os.path.join(CODECS, "binary_codecs", "bpg.py"))
    with pytest.raises(FileNotFoundError):
        bpg.build_class()  # bpgenc absent in this image

    pickle_cfg = import_config_from_file(os.path.join(CODECS, "pickle.py"))
    pc = pickle_cfg.build_class()
    obj = {"x": [1, 2], "y": "z"}
    assert pc.decompress(pc.compress(obj)) == obj

    z = import_config_from_file(
        os.path.join(CODECS, "py_zlib.py")).build_class()
    arr = np.arange(256, dtype=np.uint8)
    assert np.array_equal(np.asarray(z.decompress(z.compress(arr))), arr)
