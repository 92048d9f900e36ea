"""Round-2 correctness fixes: y-stride generality in the fused TPU coding
path, searched-complexity persistence in params.pkl, and CLI seed plumbing.
"""

import numpy as np
import jax
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph


def test_tpu_mode_stride8_matches_compat():
    """The fused encode path must derive the y shape from node_specs, not a
    hardcoded /16 (round-1 landmine at graph_codec.py:339)."""
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", context_channels=24, y_stride=8)
    assert specs["y"][1] == 8 and specs["z"][1] == 32
    codec = LatentGraphCodec(model, specs, coding_mode="tpu", num_lanes=32,
                             alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    assert codec._tpu_ok

    img = SyntheticImageDataset(1, 64, 32).get_data_at(0)
    stream = codec.compress(img)
    assert stream[0] == codec.MODE_TPU
    rec_tpu = codec.decompress(stream)

    codec.coding_mode = "compat"
    rec_compat = codec.decompress(codec.compress(img))
    np.testing.assert_array_equal(rec_tpu, rec_compat)


def test_params_pkl_persists_complexity_levels(tmp_path):
    """post_training search results must survive a restart (parity: the
    reference stores _complexity_param_all_levels in state_dict,
    latent_graph.py:619-621)."""
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", context_channels=24)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec.complexity_levels = [{"x_y": 0}, {"x_y": 2}]

    trainer = NeuralCodecTrainer(output_dir=str(tmp_path))
    trainer.save_params(codec)

    fresh = LatentGraphCodec(model, specs)
    assert trainer.load_params(fresh)
    assert fresh.complexity_levels == [{"x_y": 0}, {"x_y": 2}]
    assert fresh._complex_level == 1
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           fresh.params, codec.params)


def test_benchmark_seed_plumbs_to_trainer():
    from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark

    class _Trainer:
        seed = 0

        def train_module(self, codec):
            pass

    bm = BasicCompressionBenchmark(trainer=_Trainer())
    bm.run_benchmark(run_training=True, run_testing=False, seed=1234)
    assert bm.trainer.seed == 1234
