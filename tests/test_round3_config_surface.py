"""Round-3 config surface completion: benchmark/metrics/worker configs,
configs/utils builders, nnmodules trainer + pretrained dirs, 26 trainer
model-wrapper configs (beta1 plumbing), the Cheng2020/ELIC `newbb`
presets wired through build_basic_scalable_graph(backbone=...), and the
dedicated kernel-ablation grid."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.config.import_utils import (
    import_all_config_from_dir,
    import_config_from_file,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
CFG = os.path.join(REPO, "configs")


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("sub, expected", [
    ("benchmark", 6), (os.path.join("benchmark", "metrics"), 4),
    (os.path.join("benchmark", "training_configs"), 1),
    ("utils", 2),
    (os.path.join("nnmodules", "trainer"), 4),
    (os.path.join("nnmodules", "trainer", "model_wrapper_configs"), 5),
    (os.path.join("nnmodules", "trainer", "trainer_configs"), 4),
    (os.path.join("nnmodules", "pretrained"), 2),
    (os.path.join("nnmodules", "pretrained", "detectron2"), 4),
    (os.path.join("nnmodules", "pretrained", "torchvision"), 2),
    (os.path.join("trainer", "model_wrapper_configs"), 26),
])
def test_config_dir_counts(sub, expected):
    cfgs = import_all_config_from_dir(os.path.join(CFG, sub))
    assert len(cfgs) == expected


def test_all_model_wrapper_configs_drive_an_update():
    from cbench_basic_tpu.train.trainer import make_rd_optimizer
    wrappers = import_all_config_from_dir(
        os.path.join(CFG, "trainer", "model_wrapper_configs"))
    params = {"w": jnp.ones(3), "eb": {"quantiles": jnp.ones(2)}}
    for name, d in sorted(wrappers.items()):
        kw = {k: v for k, v in d.items()
              if k in ("learning_rate", "optimizer", "momentum", "beta1",
                       "aux_learning_rate")}
        tx = make_rd_optimizer(**kw)
        st = tx.init(params)
        up, _ = tx.update(jax.tree.map(jnp.ones_like, params), st, params)
        assert np.isfinite(float(up["w"][0])), name


def test_grouped_benchmark_config_runs(tmp_path):
    from cbench_basic_tpu.codecs.lossless import ZlibCodec, ZstdCodec
    from cbench_basic_tpu.data.datasets import SyntheticImageDataset
    cfg = import_config_from_file(
        os.path.join(CFG, "benchmark", "lossless_compression_grouped.py"))
    cfg.update_slot_params(
        named_codecs=(("zlib", ZlibCodec()), ("zstd", ZstdCodec())),
        dataloader=SyntheticImageDataset(num_items=2, height=32, width=32))
    bench = cfg.build_class()
    bench.output_dir = str(tmp_path)
    results = bench.run_benchmark()
    assert set(results) == {"zlib", "zstd"}
    for row in results.values():
        assert row["compression_ratio"] < 1.1


def test_detectron2_pretrained_detector_contract():
    cfg = import_config_from_file(os.path.join(
        CFG, "nnmodules", "pretrained", "detectron2", "base.py"))
    det = cfg.build_class()
    img = (np.random.default_rng(0).random((64, 96, 3)) * 255).astype(
        np.uint8)
    out = det(img)
    assert out["boxes"].shape[1] == 4
    assert len(out["scores"]) == len(out["classes"]) == len(out["boxes"])
    # deterministic per image
    out2 = det(img)
    assert np.allclose(out["boxes"], out2["boxes"])


def test_newbb_preset_forward():
    mod = _load_module(os.path.join(
        CFG, "presets", "lossy_latent_graph_scalable_ar_models_newbb.py"),
        "newbb_preset")
    assert len(mod.PRESETS) == 4
    codec = mod._codec(0.01, "elic_noattn", widths=(4, 6), n=8, m=12)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    out = codec.model.apply({"params": codec.params}, x, training=True,
                            rng=jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat
               if hasattr(l, "dtype"))


def test_kernel_ablation_grid():
    os.environ["CBENCH_SMALL"] = "1"
    try:
        cfg = import_config_from_file(os.path.join(
            CFG, "lossy_latent_graph_topogroup_abl_kernel.py"))
        assert len(cfg) == 9  # 3 structures x 3 kernels
        names = {c.name for c in cfg}
        assert len(names) == 9
        bench = cfg[0].build_class()
        assert bench.codec is not None
    finally:
        os.environ.pop("CBENCH_SMALL", None)


def test_group_benchmark_builder_hashes_long_names(tmp_path):
    mod_cfg = import_config_from_file(
        os.path.join(CFG, "utils", "group_benchmark_builder.py"))
    from cbench_basic_tpu.codecs.lossless import ZlibCodec
    from cbench_basic_tpu.data.datasets import SyntheticImageDataset
    long_name = "x" * 400
    mod_cfg.update_slot_params(
        codec_builders=((long_name, ZlibCodec()),),
        dataloader=SyntheticImageDataset(num_items=1, height=16, width=16),
        codec_name_length_limit=64, codec_name_hash_length=8)
    bench = mod_cfg.build_class()
    name = bench.named_codecs[0][0]
    assert len(name) == 64 and name.startswith("x" * 56)
