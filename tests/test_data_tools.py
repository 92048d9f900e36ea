"""tools/directory_to_pdrecords.py + tools/run_tensorboard_with_name.py
and the packed-bytes (.npy records / serialize_format="raw") table path.

Parity: reference tools of the same names; the packed table feeds the
byte-stream codecs through PandasTableDataset.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_directory_to_pdrecords_roundtrip(tmp_path):
    from directory_to_pdrecords import pack_directory

    payloads = {"a.bin": b"\x00\x01hello", "b.bin": b"world" * 50,
                "c.bin": b""}
    src = tmp_path / "src"
    src.mkdir()
    for name, blob in payloads.items():
        (src / name).write_bytes(blob)
    out = str(tmp_path / "packed.npy")
    assert pack_directory(str(src), out, verbose=False) == 3

    from cbench_basic_tpu.data.extra_datasets import PandasTableDataset

    ds = PandasTableDataset(out, serialize_format="raw")
    assert ds.get_length() == 3
    got = [ds.get_data_at(i) for i in range(3)]
    # sorted file order: a, b, c
    assert got == [payloads["a.bin"], payloads["b.bin"], payloads["c.bin"]]

    # the packed rows feed a byte codec round trip
    from cbench_basic_tpu.codecs.lossless import ZlibCodec

    codec = ZlibCodec()
    rt = codec.decompress(codec.compress(got[1]))
    assert bytes(rt) == payloads["b.bin"]


def test_tensorboard_logdir_spec(tmp_path):
    from run_tensorboard_with_name import build_logdir_spec

    for d, name in [("abc12345fullhash", "exp_one(a=1)"),
                    ("def6789hash", "exp_two")]:
        run = tmp_path / d
        run.mkdir()
        (run / "config_name.txt").write_text(name + "\n")
    (tmp_path / "no_name_dir").mkdir()  # skipped: no name file

    spec = build_logdir_spec(str(tmp_path))
    parts = sorted(spec.split(","))
    assert len(parts) == 2
    assert parts[0].startswith("(abc12345)exp_one(a=1):")
    assert parts[1].startswith("(def6789h)exp_two:")

    # reference-layout fallback name file
    (tmp_path / "no_name_dir" / "exp_name.txt").write_text("legacy\n")
    assert "legacy" in build_logdir_spec(str(tmp_path))
