"""Sub-config library + slot-sweep experiments (parity: reference
configs/codecs/** module library and sweep-driven experiment files)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cbench_basic_tpu.config.import_utils import (
    import_all_config_from_dir,
    import_config_from_file,
)

ROOT = os.path.join(os.path.dirname(__file__), "..")
CODECS_DIR = os.path.join(ROOT, "configs", "codecs")


def test_codec_config_dir_is_a_choices_library():
    lib = import_all_config_from_dir(CODECS_DIR)
    expected = {"topogroup", "hyperprior", "basic_scalable", "vq", "fsar",
                "png", "webp", "jpeg", "zlib", "zstd", "lzma", "bz2",
                "entroformer", "prior_coder_zoo"}
    assert expected <= set(lib), sorted(lib)


def test_new_codec_configs_build_small():
    from cbench_basic_tpu.data import SyntheticImageDataset

    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    cfg = import_config_from_file(os.path.join(CODECS_DIR, "prior_coder_zoo.py"))
    cfg.update_slot_params(coder="univar_gauss_dvq", L=2, K=8, D=4, N=16)
    codec = cfg.build_class()
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape
    assert "coder=univar_gauss_dvq" in cfg.name

    cfg2 = import_config_from_file(os.path.join(CODECS_DIR, "entroformer.py"))
    cfg2.update_slot_params(N=16, M=8, depth=1, heads=2, dim_embed=16)
    codec2 = cfg2.build_class()
    rec2 = codec2.decompress(codec2.compress(img))
    assert rec2.shape == img.shape


@pytest.mark.parametrize("name", ["topogroup", "hyperprior", "vq", "fsar",
                                  "png", "zlib"])
def test_each_codec_config_imports_cleanly(name):
    # import_all_config_from_dir swallows failures; import directly so a
    # broken sub-config is a test failure, not a silent hole.
    cfg = import_config_from_file(os.path.join(CODECS_DIR, f"{name}.py"))
    assert hasattr(cfg, "build_class")


def test_slot_addressing_builds_small_codec():
    from cbench_basic_tpu.data import SyntheticImageDataset

    cfg = import_config_from_file(os.path.join(CODECS_DIR, "topogroup.py"))
    cfg.update_slot_params(pattern="checkerboard", ncg=1, N=8, M=12, ctx=24)
    codec = cfg.build_class()
    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape
    # Non-default slot values appear in the derived experiment name.
    assert "pattern=checkerboard" in cfg.name and "ncg=1" in cfg.name


def test_run_benchmark_slot_sweep_multiple_dirs(tmp_path):
    """The ablation experiment file + --seed must produce one experiment
    directory per swept combination through the real CLI."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        CBENCH_SMALL="1", CBENCH_EPOCHS="1", CBENCH_BATCH="2",
        CBENCH_PATCH="64", CBENCH_STEPS_PER_EPOCH="2",
        CBENCH_TEST_ITEMS="1", CBENCH_TEST_H="64", CBENCH_TEST_W="64",
        CBENCH_PATTERNS="checkerboard,scanline", CBENCH_NCGS="1",
    )
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "run_benchmark.py"),
         os.path.join(ROOT, "configs", "lossy_latent_graph_topogroup.py"),
         "-o", str(tmp_path), "--seed", "7"],
        env=env, capture_output=True, text=True, timeout=3000)
    assert out.returncode == 0, out.stderr[-3000:]
    exp_dirs = [d for d in os.listdir(tmp_path)
                if os.path.isdir(tmp_path / d)]
    assert len(exp_dirs) == 2, exp_dirs
    for d in exp_dirs:
        assert (tmp_path / d / "metrics.csv").exists()
    names = " ".join(exp_dirs)
    assert "checkerboard" in names and "scanline" in names


def test_collect_repeat_results_merges(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from collect_repeat_results import merge_repeats

    rows = [
        {"experiment": "exp_a_r1", "psnr": "30.0", "bpp": "1.0"},
        {"experiment": "exp_a_r2", "psnr": "32.0", "bpp": "1.2"},
        {"experiment": "exp_b", "psnr": "28.0"},
    ]
    merged = {m["experiment"]: m for m in merge_repeats(rows)}
    assert merged["exp_a"]["num_repeats"] == 2
    assert merged["exp_a"]["psnr_mean"] == pytest.approx(31.0)
    assert merged["exp_a"]["psnr_std"] == pytest.approx(1.0)
    assert merged["exp_b"]["num_repeats"] == 1
