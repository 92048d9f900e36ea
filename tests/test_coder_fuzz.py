"""Randomized fuzz round trips for the native coders (SURVEY §5.2: the
reference has no sanitizer/fuzz coverage — we add it). Exercises random
table shapes, skewed distributions, extreme offsets, and tiny/large inputs.

Set CBENCH_TPU_ASAN=1 to additionally run against an ASAN/UBSAN build of
the native library (separate process)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cbench_basic_tpu.coding import Rans64Decoder, Rans64Encoder
from cbench_basic_tpu.coding.tans import TansDecoder, TansEncoder


@pytest.mark.parametrize("trial", range(8))
def test_rans_fuzz_roundtrip(trial):
    rng = np.random.default_rng(100 + trial)
    num_dists = int(rng.integers(1, 33))
    num_symbols = int(rng.integers(2, 300))
    freqs = rng.integers(1, int(rng.integers(2, 5000)),
                         (num_dists, num_symbols)).astype(np.int32)
    offsets = rng.integers(-1000, 1000, num_dists).astype(np.int32)
    nfreqs = np.full(num_dists, num_symbols, np.int32)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)

    n = int(rng.integers(1, 5000))
    idx = rng.integers(0, num_dists, n).astype(np.int32)
    # Values deliberately exceed table ranges in both directions.
    data = (offsets[idx] + rng.integers(-50, num_symbols + 50, n)).astype(np.int32)
    out = dec.decode_with_indexes(enc.encode_with_indexes(data, idx), idx)
    np.testing.assert_array_equal(out, data)


@pytest.mark.parametrize("trial", range(4))
def test_tans_fuzz_roundtrip(trial):
    rng = np.random.default_rng(200 + trial)
    num_dists = int(rng.integers(1, 9))
    num_symbols = int(rng.integers(4, 200))
    freqs = rng.integers(1, 2000, (num_dists, num_symbols)).astype(np.int32)
    offsets = rng.integers(-100, 100, num_dists).astype(np.int32)
    nfreqs = np.full(num_dists, num_symbols, np.int32)
    enc = TansEncoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    dec = TansDecoder(max_symbol_value=num_symbols - 1, bypass_coding=True)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)
    n = int(rng.integers(1, 3000))
    idx = rng.integers(0, num_dists, n).astype(np.int32)
    data = (offsets[idx] + rng.integers(-20, num_symbols + 20, n)).astype(np.int32)
    out = dec.decode_with_indexes(enc.encode_with_indexes(data, idx), idx)
    np.testing.assert_array_equal(out, data)


@pytest.mark.skipif(os.environ.get("CBENCH_TPU_ASAN") != "1",
                    reason="ASAN fuzz is opt-in (CBENCH_TPU_ASAN=1)")
def test_asan_build_roundtrip():
    """Run a round trip inside a subprocess with the sanitizer build
    LD_PRELOADed (catches heap overflows in the coder loops)."""
    from cbench_basic_tpu.coding._build import sanitizer_build
    lib = sanitizer_build("anscoder", ["anscoder.cpp", "tanscoder.cpp"])
    import subprocess as sp
    asan_rt = sp.run(["g++", "-print-file-name=libasan.so"],
                     capture_output=True, text=True).stdout.strip()
    code = (
        "import ctypes, numpy as np;"
        f"ctypes.CDLL('{lib}', mode=ctypes.RTLD_GLOBAL);"
        "from cbench_basic_tpu.coding import Rans64Encoder, Rans64Decoder;"
        "import numpy as np;"
        "rng=np.random.default_rng(0);"
        "f=rng.integers(1,100,(4,32)).astype(np.int32);"
        "e=Rans64Encoder(); d=Rans64Decoder();"
        "e.init_params(f,np.full(4,32),np.zeros(4));"
        "d.init_params(f,np.full(4,32),np.zeros(4));"
        "x=rng.integers(0,60,1000).astype(np.int32);"
        "i=rng.integers(0,4,1000).astype(np.int32);"
        "assert (d.decode_with_indexes(e.encode_with_indexes(x,i),i)==x).all();"
        "print('asan ok')"
    )
    env = dict(os.environ, ASAN_OPTIONS="detect_leaks=0",
               LD_PRELOAD=asan_rt)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
