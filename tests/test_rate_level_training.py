"""Variable-rate (gain-vector) training: NeuralCodecTrainer's
rate_level_lambdas samples a traced rate level + its λ per step, training
one parameter set that serves every rate level (parity: the reference's
AutoEncoderPriorModelBackboneV2 per-level gain/λ pairing,
prior_model/autoencoder_v2.py:26-737)."""
import numpy as np
import pytest

import jax

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

LAMBDAS = (0.002, 0.02)


def _build_codec(num_rate_levels=len(LAMBDAS)):
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", y_stride=4,
        context_channels=16, num_rate_levels=num_rate_levels)
    codec = LatentGraphCodec(model, specs, alignment=16, coding_mode="compat")
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    return codec


class _Loader:
    def __iter__(self):
        rng = np.random.default_rng(0)
        for _ in range(4):
            yield rng.random((2, 32, 32, 3), np.float32)


def test_rate_level_training_updates_params_and_levels_differ(tmp_path):
    codec = _build_codec()
    before = jax.tree_util.tree_map(np.asarray, codec.params)
    trainer = NeuralCodecTrainer(
        dataloader=_Loader(), num_epochs=2, learning_rate=1e-3,
        output_dir=str(tmp_path), data_parallel=False, log_every=2,
        rate_level_lambdas=LAMBDAS)
    metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, codec.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # the two trained rate levels produce different coded rates through
    # the REAL compress path (gain vectors actually change the bitstream)
    img = (np.random.default_rng(1).random((32, 32, 3)) * 255).astype(np.uint8)
    codec.update_state()
    sizes = []
    for lvl in range(len(LAMBDAS)):
        codec.set_rate_level(lvl)
        stream = codec.compress(img)
        assert codec.decompress(stream).shape == img.shape
        sizes.append(len(stream))
    assert sizes[0] != sizes[1]


def test_rate_lambdas_without_rate_axis_warns_and_trains(tmp_path, caplog):
    codec = _build_codec(num_rate_levels=1)
    trainer = NeuralCodecTrainer(
        dataloader=_Loader(), num_epochs=1, learning_rate=1e-3,
        output_dir=str(tmp_path), data_parallel=False, log_every=2,
        rate_level_lambdas=LAMBDAS)
    with caplog.at_level("WARNING"):
        metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    assert any("rate_level_lambdas" in r.message for r in caplog.records)


def test_rate_level_training_in_scan_mode(tmp_path):
    from cbench_basic_tpu.data.device_data import DevicePatchSampler
    codec = _build_codec()
    rng = np.random.default_rng(2)
    imgs = [(rng.random((48, 48, 3)) * 255).astype(np.uint8) for _ in range(2)]
    sampler = DevicePatchSampler(imgs, patch_size=32, batch_size=2,
                                 steps_per_epoch=4)
    trainer = NeuralCodecTrainer(
        dataloader=sampler, num_epochs=1, scan_steps=2, learning_rate=1e-3,
        output_dir=str(tmp_path), data_parallel=False, log_every=2,
        rate_level_lambdas=LAMBDAS)
    before = jax.tree_util.tree_map(np.asarray, codec.params)
    metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, codec.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
