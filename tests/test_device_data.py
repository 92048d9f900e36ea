"""On-device data pipeline (data/device_data.py) + the trainer's scanned
inner loop (NeuralCodecTrainer(scan_steps=K)).

TPU-native replacement for the reference's host-side torch DataLoader
(reference cbench/data/dataloaders/basic.py): the image set lives in HBM
and patch sampling is a pure function of a PRNG key, so K train steps run
under one lax.scan dispatch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data.device_data import DevicePatchSampler
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer


def _images(seed=0):
    rng = np.random.default_rng(seed)
    # Different sizes: exercises the padded-canvas + per-image bounds path.
    return [
        (rng.random((48, 64, 3)) * 200 + 20).astype(np.uint8),
        (rng.random((40, 40, 3)) * 200 + 20).astype(np.uint8),
        (rng.random((64, 48, 3)) * 200 + 20).astype(np.uint8),
    ]


def _tiny_codec(seed=0):
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", context_channels=24,
        lmbda=0.01, y_stride=8)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 32, 32, 3))
    return codec


def test_sampler_shapes_and_determinism():
    s = DevicePatchSampler(_images(), patch_size=32, batch_size=4)
    k = jax.random.PRNGKey(0)
    a = s.sample(k)
    assert a.shape == (4, 32, 32, 3) == s.batch_shape
    assert a.dtype == jnp.float32
    # Pure function of the key.
    np.testing.assert_array_equal(np.asarray(a), np.asarray(s.sample(k)))
    b = s.sample(jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_sampler_never_reads_canvas_padding():
    # Every source pixel is >= 20/255; canvas padding is 0. If any crop
    # offset escaped an image's valid bounds, a zero would appear.
    s = DevicePatchSampler(_images(), patch_size=32, batch_size=8,
                           augment=True)
    k = jax.random.PRNGKey(42)
    for i in range(16):
        patch = np.asarray(s.sample(jax.random.fold_in(k, i)))
        assert patch.min() > 0.0
        assert patch.max() <= 1.0


def test_sampler_traceable_under_scan():
    s = DevicePatchSampler(_images(), patch_size=16, batch_size=2,
                           augment=True)

    @jax.jit
    def mean_of_k(key):
        def body(r, _):
            r, k = jax.random.split(r)
            return r, jnp.mean(s.sample(k))
        _, ms = jax.lax.scan(body, key, None, length=4)
        return ms

    ms = mean_of_k(jax.random.PRNGKey(0))
    assert ms.shape == (4,)
    assert np.all(np.isfinite(np.asarray(ms)))


def test_sampler_bank_is_uint8_and_arg_threaded():
    # The bank must be uint8 (4x less HBM than fp32) and usable as a jit
    # ARGUMENT via sample_from — closing over a large bank embeds it as an
    # HLO constant, which remote-compile services reject (HTTP 413) and
    # which duplicates HBM. sample(key) and sample_from(bank, key) must
    # agree bit-for-bit.
    imgs = _images()
    imgs.append(np.random.default_rng(3).random((40, 40, 3))
                .astype(np.float32) * 0.8 + 0.1)  # float [0,1] source
    s = DevicePatchSampler(imgs, patch_size=16, batch_size=3,
                           color_permute=True)
    assert s.images.dtype == jnp.uint8
    k = jax.random.PRNGKey(7)
    direct = np.asarray(s.sample(k))

    f = jax.jit(lambda bank, key: s.sample_from(bank, key))
    via_arg = np.asarray(f(s.bank, k))
    # jit may fuse /255 as a reciprocal multiply: allow 1-ulp fp noise.
    np.testing.assert_allclose(direct, via_arg, atol=1e-6)
    # The lowered program must NOT contain the bank as a constant: its
    # text stays small and lists the bank among the parameters.
    txt = f.lower(s.bank, k).as_text()
    n, h, w = s.images.shape[:3]
    assert f"{n}x{h}x{w}x3" in txt  # bank appears as a parameter shape


def test_sampler_host_iter_fallback():
    s = DevicePatchSampler(_images(), patch_size=16, batch_size=2,
                           steps_per_epoch=3)
    batches = list(s)
    assert len(batches) == 3
    assert batches[0].shape == (2, 16, 16, 3)


def test_trainer_scan_steps_path(tmp_path):
    codec = _tiny_codec()
    before = jax.device_get(codec.params)
    sampler = DevicePatchSampler(_images(), patch_size=32, batch_size=2,
                                 steps_per_epoch=4)
    trainer = NeuralCodecTrainer(
        dataloader=sampler, num_epochs=1, scan_steps=2,
        output_dir=str(tmp_path), data_parallel=False, log_every=1)
    metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    # 4 steps_per_epoch / 2 scan_steps = 2 chunks of 2 steps: params moved.
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, codec.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_trainer_scan_steps_falls_back_without_sampler(tmp_path):
    codec = _tiny_codec()

    class _Loader:
        def __iter__(self):
            rng = np.random.default_rng(0)
            return iter([rng.random((2, 32, 32, 3)).astype(np.float32)])

    trainer = NeuralCodecTrainer(
        dataloader=_Loader(), num_epochs=1, scan_steps=4,
        output_dir=str(tmp_path), data_parallel=False, log_every=1)
    metrics = trainer.train_module(codec)  # warns, uses the per-batch loop
    assert np.isfinite(metrics["loss"])
