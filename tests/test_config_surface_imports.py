"""Import EVERY config file in the library.

The config surface is the product's UI (399 files mirroring the
reference's configs/ tree); a single broken import silently removes a
choice from every dir-as-enum slot (import_all_config_from_dir skips
failures in some paths) — this sweep pins the whole surface.
"""

import os

import pytest

from cbench_basic_tpu.config.import_utils import import_config_from_file

CFG = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                   "configs"))


def _all_config_files():
    out = []
    for dirpath, dirnames, files in os.walk(CFG):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py") and not f.startswith("_"):
                out.append(os.path.join(dirpath, f))
    return out


ALL = _all_config_files()


def test_config_surface_size():
    # the library mirrors the reference's per-file surface; don't let it
    # silently shrink
    assert len(ALL) >= 380, f"config library shrank to {len(ALL)} files"


@pytest.mark.parametrize(
    "path", ALL, ids=[os.path.relpath(p, CFG) for p in ALL])
def test_config_file_imports(path):
    try:
        import_config_from_file(path)  # config may legitimately be None
        return  # ("none" choice files)
    except AttributeError as e:
        if "has no attribute 'config'" not in str(e):
            raise
    # helper/constant modules (env.py, preset collections) export named
    # symbols instead of `config` — they must still import cleanly
    import importlib.util

    name = "cfgsweep_" + os.path.relpath(path, CFG).replace(
        os.sep, "_").removesuffix(".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)