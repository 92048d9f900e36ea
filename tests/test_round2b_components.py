"""Round-2 breadth components: iterative complexity search, per-stage
coding profiler, TensorBoard cache logging, augmentation transforms.

Parity: latent_graph.py:1463-1641 (iterative _recursive_reduce search,
controller subsets, coding-time complexity metrics), modules/base.py:159
(profiler aggregation into benchmark metrics), nn/trainer.py TB cache
logging, reference dataset augmentation stacks.
"""

import os

import jax
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.builders import build_basic_scalable_graph
from cbench_basic_tpu.graph.complexity_search import (
    IterativeComplexitySearch,
    config_flops,
    post_training_complexity_search,
)


def _codec():
    model, specs, _ = build_basic_scalable_graph(
        N=8, M=12, widths=(4, 6, 8), pattern="checkerboard",
        num_channel_groups=1, context_channels=16)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return model, specs, codec


def test_iterative_search_monotone_and_controller_subset():
    model, specs, codec = _codec()
    images = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]

    levels = post_training_complexity_search(
        codec, images, num_levels=4, method="iterative")
    assert len(levels) == 4
    flops = [config_flops(model, specs, cfg) for cfg in levels]
    assert all(f1 <= f2 for f1, f2 in zip(flops, flops[1:]))
    assert levels[-1] == {n: 2 for n in levels[-1]}
    assert levels[0] == {n: 0 for n in levels[0]}

    # controller subset: only the named edges vary
    search = IterativeComplexitySearch(
        codec, images, num_levels=3,
        controller_edges=["x_y", "y_x"])
    sub_levels = search.search()
    for cfg in sub_levels:
        assert set(cfg) == {"x_y", "y_x"}

    with pytest.raises(ValueError):
        IterativeComplexitySearch(codec, images,
                                  controller_edges=["nope"])


def test_iterative_search_coding_time_metric():
    model, specs, codec = _codec()
    images = [SyntheticImageDataset(1, 64, 64).get_data_at(0)]
    search = IterativeComplexitySearch(
        codec, images, num_levels=3, complexity_metric="coding_time",
        controller_edges=["x_y"])
    c_hi = search._complexity({"x_y": 2})
    assert c_hi > 0  # measured wall time
    levels = search.search()
    assert len(levels) == 3
    # the searched table still drives real coding
    codec.complexity_levels = levels
    codec.set_complex_level(0)
    img = images[0]
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape


def test_profiler_stages_reach_benchmark_metrics():
    from cbench_basic_tpu.bench.benchmark import BenchmarkTestingWorker

    _, _, codec = _codec()
    ds = SyntheticImageDataset(num_items=1, height=64, width=64)
    worker = BenchmarkTestingWorker(codec, ds)
    metrics = worker()
    stage_keys = [k for k in metrics if k.startswith("profile_")]
    assert any("encode" in k for k in stage_keys)
    assert any("decode_node" in k or "decode_device" in k for k in stage_keys)
    assert all(metrics[k] >= 0 for k in stage_keys)
    # profile is reset after collection
    assert codec.collect_profile() == {}


def test_tb_writer_scalars_hists_images(tmp_path):
    from cbench_basic_tpu.utils.tb_logging import TrainingLogWriter

    d = str(tmp_path / "tb")
    tb = TrainingLogWriter(d)
    tb.add_scalars({"loss": 1.0, "bpp": 0.5}, step=1)
    tb.add_histogram("w", np.random.randn(100), step=1)
    tb.add_param_histograms({"dense": {"kernel": np.ones((3, 3))}}, step=1)
    tb.add_image("rec", np.random.rand(8, 8, 3), step=1)
    tb.close()
    # event files (or the pkl fallback) were written
    assert os.listdir(d)


def test_trainer_tb_logging(tmp_path):
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    _, _, codec = _codec()
    data = [np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)]
    trainer = NeuralCodecTrainer(
        dataloader=data, num_epochs=1, data_parallel=False, log_every=1,
        output_dir=str(tmp_path / "run"), tb_log=True,
        tb_hist_every_epochs=1)
    metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    assert os.listdir(str(tmp_path / "run" / "tb"))


def test_augmentations():
    from cbench_basic_tpu.data.transforms import (
        Compose,
        color_jitter,
        random_flip,
        random_rotate90,
    )

    rng = np.random.default_rng(0)
    img = (np.random.RandomState(1).rand(16, 20, 3) * 255).astype(np.uint8)

    flipped = random_flip(img, np.random.default_rng(42))
    assert flipped.shape == img.shape
    rot = random_rotate90(img, rng)
    assert sorted(rot.shape) == sorted(img.shape)
    jit = color_jitter(img, rng)
    assert jit.dtype == np.uint8 and jit.shape == img.shape
    # jitter on floats stays in [0, 1]
    jf = color_jitter(img.astype(np.float32) / 255.0, rng)
    assert jf.dtype == np.float32 and 0.0 <= jf.min() and jf.max() <= 1.0

    pipe = Compose([random_flip, random_rotate90,
                    lambda im, r: color_jitter(im, r, 0.1, 0.1, 0.1)])
    out = pipe(img, rng)
    assert out.dtype == np.uint8

    # the training patch loader applies the augmentation pipeline per patch
    from cbench_basic_tpu.data import BatchedPatchLoader, SyntheticImageDataset
    loader = BatchedPatchLoader(SyntheticImageDataset(2, 32, 32),
                                batch_size=2, patch_size=16,
                                augment=Compose([random_flip]))
    batch = next(iter(loader))
    assert batch.shape == (2, 16, 16, 3) and batch.dtype == np.float32
