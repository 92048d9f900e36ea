"""Lazy native-library build for the entropy-coding backend.

The C++ sources in ``csrc/`` are compiled once into a shared library next to
the sources. Rebuilds happen automatically when a source file is newer than
the built library.
"""

import os
import subprocess
from pathlib import Path

_CSRC = Path(__file__).resolve().parent / "csrc"

_CXX = os.environ.get("CXX", "g++")
_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-g"]


def build_library(name: str, sources: list[str]) -> Path:
    """Compile `sources` (relative to csrc/) into csrc/_<name>.so and return its path."""
    out = _CSRC / f"_{name}.so"
    srcs = [_CSRC / s for s in sources]
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return out
    cmd = [_CXX, *_FLAGS, "-o", str(out), *[str(s) for s in srcs]]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"failed to build native library {name}:\n{' '.join(cmd)}\n{proc.stderr}"
        )
    return out


def sanitizer_build(name: str, sources: list[str]) -> Path:
    """ASAN/UBSAN build used by fuzz tests (opt-in via CBENCH_TPU_ASAN=1)."""
    out = _CSRC / f"_{name}_asan.so"
    srcs = [_CSRC / s for s in sources]
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return out
    cmd = [
        _CXX, "-O1", "-std=c++17", "-shared", "-fPIC", "-g",
        "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
        "-o", str(out), *[str(s) for s in srcs],
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"failed sanitizer build {name}: {proc.stderr}")
    return out
