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


def test_nn_experiment_config_builds():
    os.environ["CBENCH_NN_MODELS"] = "vqvae,vqvae_selftrain"
    try:
        cfg = import_config_from_file(os.path.join(CFG, "nn.py"))
        assert len(cfg) == 2
        bench = cfg[1].build_class()
        assert type(bench.codec).__name__ == "VQVAECodec"
        assert bench.codec.is_trainable  # selftrain carries its trainer
        plain = cfg[0].build_class()
        assert not plain.codec.is_trainable
    finally:
        os.environ.pop("CBENCH_NN_MODELS", None)


def test_torch_loader_iterate_unbatches():
    from cbench_basic_tpu.data.dataloaders import TorchDataLoader
    from cbench_basic_tpu.data.datasets import SyntheticImageDataset
    ds = SyntheticImageDataset(num_items=5, height=16, width=16)
    loader = TorchDataLoader(ds, batch_size=2, shuffle=False)
    loader.max_samples = 3
    samples = list(loader.iterate())
    assert len(samples) == 3
    assert samples[0].shape == (16, 16, 3)


def test_vqvae_codec_train_self_improves_loss():
    import jax

    from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
    from cbench_basic_tpu.data.datasets import (
        BatchedPatchLoader,
        SyntheticImageDataset,
    )
    from cbench_basic_tpu.nn.models.vqvae import VQVAE

    codec = VQVAECodec(VQVAE(hidden=8, dim=4, num_codes=16))
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    class _T:  # minimal trainer contract for train_self
        dataloader = BatchedPatchLoader(
            SyntheticImageDataset(num_items=4, height=32, width=32),
            batch_size=2, patch_size=32, steps_per_epoch=4)
        num_epochs = 2
        learning_rate = 3e-3
        seed = 0

    codec.set_trainer(_T())
    assert codec.is_trainable
    first = codec.train_self()
    assert np.isfinite(first["loss"])
    # codec still codes after self-training (tables rebuilt lazily)
    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(
        np.uint8)
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape

@pytest.mark.parametrize("variant", [
    "base", "st_samp_anneal", "asym_st_anneal", "double_st_samp_anneal",
    "st_klneg", "st_commit_kl0", "commit_exp_samp"])
def test_vqvae_v2_variant_grid_trains_one_step(variant):
    """The reference's active nn.py experiment grid (configs/nn.py:106-326):
    each dist_type x st x sampling x kl/commitment variant builds through
    the vqvae_v2 slots and takes a finite training step."""
    import sys
    sys.path.insert(0, CFG)
    nn_cfg = _load_module(os.path.join(CFG, "nn.py"), "nn_cfg_mod")
    codec = nn_cfg._codec_v2(variant)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 16, 16, 3))
    x = jnp.asarray(
        np.random.default_rng(1).random((2, 16, 16, 3)), jnp.float32)

    def loss(p):
        out, _ = codec.model.apply(
            {"params": p, **{k: v for k, v in codec.variables.items()
                             if k != "params"}},
            x, training=True, rng=jax.random.PRNGKey(2),
            mutable=["vq_stats"])
        return sum(out["losses"].values()) + out["metrics"]["mse"]

    l, g = jax.value_and_grad(loss)(codec.params)
    assert np.isfinite(float(l))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(v)) for v in leaves)
    # eval path (test_sampling / argmax) also runs
    idx = codec.model.apply(codec.variables, x[:1],
                            method=codec.model.encode_indices)
    assert idx.shape == (1, 4, 4)
