"""SelfTrainableInterface: codecs that own their trainer train themselves
when the benchmark has no external trainer (reference SelfTrainableModule
protocol, modules/base.py)."""

import jax
import numpy as np

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.codecs.base import (
    GroupedVariableRateCodec,
    SelfTrainableInterface,
)
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer


def _codec():
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, context_channels=16, y_stride=8)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    return codec


def test_codec_trains_itself_in_benchmark(tmp_path):
    codec = _codec()
    assert isinstance(codec, SelfTrainableInterface)
    assert not codec.is_trainable
    data = [np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)]
    codec.set_trainer(NeuralCodecTrainer(
        dataloader=data, num_epochs=1, data_parallel=False, log_every=1))
    assert codec.is_trainable

    p0 = codec.params
    bench = BasicCompressionBenchmark(
        codec=codec, dataloader=SyntheticImageDataset(1, 32, 32),
        output_dir=str(tmp_path))
    bench.run_training()  # no external trainer -> codec.train_self()
    # parameters changed -> training actually ran
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(codec.params)))
    assert changed


def test_grouped_codec_exposes_self_trainable():
    g = GroupedVariableRateCodec([_codec()])
    assert isinstance(g, SelfTrainableInterface)
    assert not g.is_trainable
    assert g.train_self() == {}
