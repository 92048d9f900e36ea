"""Trainer parity features (reference LightningTrainer stack,
nn/trainer.py:1203-1401): validation + best checkpoint, finite-loss early
stop, LR schedule wiring, ParamScheduler-annealed node kwargs, and
model-list (per-λ replica) parallel training in one jitted step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer
from cbench_basic_tpu.train.schedulers import ParamScheduler, exponential_anneal


class _Loader:
    """Tiny in-memory batch loader."""

    def __init__(self, n=2, batch=2, size=32, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = [
            rng.random((batch, size, size, 3)).astype(np.float32)
            for _ in range(n)]

    def __iter__(self):
        return iter(self.batches)


def _tiny_codec(lmbda=0.01, seed=0):
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", context_channels=24,
        lmbda=lmbda, y_stride=8)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 32, 32, 3))
    return codec


def test_validation_and_best_checkpoint(tmp_path):
    codec = _tiny_codec()
    trainer = NeuralCodecTrainer(
        dataloader=_Loader(), val_dataloader=_Loader(n=1, seed=7),
        num_epochs=2, val_every_epochs=1, keep_best=True,
        output_dir=str(tmp_path), data_parallel=False, log_every=1)
    metrics = trainer.train_module(codec)
    assert "val_loss" in metrics
    assert (tmp_path / "best_params.pkl").exists()
    assert "best_epoch" in metrics
    # load_params restores the (best) exported params
    fresh = _tiny_codec()
    assert trainer.load_params(fresh)


def test_finite_guard_stops_training(tmp_path):
    codec = _tiny_codec()
    # Poison the params so the first loss is NaN.
    codec.params = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, jnp.nan), codec.params)
    trainer = NeuralCodecTrainer(
        dataloader=_Loader(), num_epochs=3, check_finite=True,
        output_dir=str(tmp_path), data_parallel=False, log_every=1)
    metrics = trainer.train_module(codec)
    assert metrics.get("stop_reason") == "non_finite_loss"


def test_lr_schedule_and_param_scheduler_run(tmp_path):
    codec = _tiny_codec()
    sched = ParamScheduler("y.temperature", exponential_anneal(2.0, 0.5, 10))
    trainer = NeuralCodecTrainer(
        dataloader=_Loader(n=1), num_epochs=1,
        lr_schedule=lambda step: 1e-4 * 0.5 ** step,
        param_schedulers=[sched],
        output_dir=str(tmp_path), data_parallel=False, log_every=1)
    metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    assert sched.value(0) == pytest.approx(2.0)
    assert sched.value(10) == pytest.approx(0.5)


def test_replica_parallel_training_two_lambdas():
    """Two λ-replicas must train concurrently in ONE jitted step over the
    (replica, data) mesh, and end up with different parameters."""
    from cbench_basic_tpu.parallel import ReplicaParallelTrainer, make_replica_mesh

    codecs = [_tiny_codec(lmbda=0.001, seed=0), _tiny_codec(lmbda=0.1, seed=0)]
    mesh = make_replica_mesh(2, jax.devices("cpu")[:8])
    assert mesh.shape == {"replica": 2, "data": 4}
    trainer = ReplicaParallelTrainer(
        dataloader=_Loader(batch=4), num_epochs=1, mesh=mesh, log_every=1)
    metrics = trainer.train_group(codecs)
    # per-replica metric vectors, all finite
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    assert len(np.asarray(metrics["loss"])) == 2
    # different λ -> diverged parameters after the same data
    leaves0 = jax.tree_util.tree_leaves(codecs[0].params)
    leaves1 = jax.tree_util.tree_leaves(codecs[1].params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_grouped_codec_parallel_flag(tmp_path):
    from cbench_basic_tpu.codecs.base import GroupedVariableRateCodec

    group = GroupedVariableRateCodec(
        [_tiny_codec(lmbda=0.001, seed=0), _tiny_codec(lmbda=0.1, seed=0)])
    trainer = NeuralCodecTrainer(
        dataloader=_Loader(batch=4), num_epochs=1, parallel_replicas=True,
        output_dir=str(tmp_path), log_every=1)
    metrics = trainer.train_module(group)
    assert "parallel_replicas" in metrics
    assert (tmp_path / "codec_0" / "params.pkl").exists()
    assert (tmp_path / "codec_1" / "params.pkl").exists()
