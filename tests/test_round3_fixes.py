"""Round-3 fixes: traced per-step finite guard, product-mode schedulers,
quantized-codec header validation, batched-coding uint16 count, zero-GT mAP
exclusion, BB-ANS seed scaling.

(VERDICT round-2 weak #6, next-round #8/#9; ADVICE round-2 all items.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def _tiny_codec(lmbda=0.01, seed=0):
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="checkerboard", context_channels=24,
        lmbda=lmbda, y_stride=8)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 32, 32, 3))
    return codec


def test_nan_at_unlogged_step_skips_update_and_stops(tmp_path):
    """A NaN batch at a step that is NOT a log_every multiple must (a) leave
    the parameters exactly as they were before that step — the traced guard
    skips the whole optimizer update on device — and (b) still stop training,
    via the device-side bad-step counter (round-2 weak #6: the host check
    only sampled every log_every steps, letting up to 49 poisoned updates
    land)."""
    rng = np.random.default_rng(0)
    good = rng.random((2, 32, 32, 3)).astype(np.float32)
    bad = np.full((2, 32, 32, 3), np.nan, np.float32)

    codec_a = _tiny_codec(seed=3)
    trainer_a = NeuralCodecTrainer(
        dataloader=_ListLoader([good, bad]), num_epochs=1, check_finite=True,
        output_dir=str(tmp_path / "a"), data_parallel=False, log_every=10)
    metrics_a = trainer_a.train_module(codec_a)
    assert metrics_a.get("stop_reason") == "non_finite_loss"

    # Same seed, same first batch, NO nan batch: must produce byte-identical
    # parameters (the nan step changed nothing, not even optimizer moments).
    codec_b = _tiny_codec(seed=3)
    trainer_b = NeuralCodecTrainer(
        dataloader=_ListLoader([good]), num_epochs=1, check_finite=True,
        output_dir=str(tmp_path / "b"), data_parallel=False, log_every=10)
    trainer_b.train_module(codec_b)

    la = jax.tree_util.tree_leaves(codec_a.params)
    lb = jax.tree_util.tree_leaves(codec_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.all(np.isfinite(np.asarray(a))) for a in la)


def test_product_loss_applies_scheduled_node_kwargs():
    """ADVICE: param_schedulers were silently ignored in product mode. The
    scheduled kwargs must reach every combination's loss (and per-combo λ
    must override a scheduled default for the same key)."""
    from cbench_basic_tpu.train.dynamic_axes import DynamicAxis, ProductLoss

    codec = _tiny_codec()
    batch = jnp.asarray(
        np.random.default_rng(1).random((1, 32, 32, 3)), jnp.float32)
    rng = jax.random.PRNGKey(0)

    pl = ProductLoss(codec, sc_axis=None, vr_axis=None, sandwich=False)
    combos = ((),)  # single empty combination
    loss_plain, _ = pl(codec.params, batch, rng, combos)
    loss_big, _ = pl(codec.params, batch, rng, combos,
                     node_kwargs={"x": {"lmbda": jnp.float32(100.0)}})
    # λ scales the distortion term: the scheduled kwarg must change the loss.
    assert float(loss_big) > float(loss_plain)

    # Per-combo λ (vr axis) overrides the scheduled default for the same key.
    pl_vr = ProductLoss(codec, sc_axis=None,
                        vr_axis=DynamicAxis("vrlevel", [0.01]),
                        sandwich=False)
    combos_vr = ((("vrlevel", 0),),)
    loss_vr, _ = pl_vr(codec.params, batch, rng, combos_vr,
                       node_kwargs={"x": {"lmbda": jnp.float32(100.0)}})
    loss_vr_ref, _ = pl_vr(codec.params, batch, rng, combos_vr)
    np.testing.assert_allclose(float(loss_vr), float(loss_vr_ref), rtol=1e-6)


def test_quantized_codec_header_rejects_mismatched_config():
    from cbench_basic_tpu.codecs.quantized_coder import QuantizedTensorCodec

    data = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    enc = QuantizedTensorCodec(prior="adaptive", precision=8)
    stream = enc.compress(data)

    with pytest.raises(ValueError, match="prior_mode"):
        QuantizedTensorCodec(prior="uniform", precision=8).decompress(stream)
    with pytest.raises(ValueError, match="precision"):
        QuantizedTensorCodec(prior="adaptive", precision=6).decompress(stream)
    # matching config still round-trips
    out = QuantizedTensorCodec(prior="adaptive", precision=8).decompress(stream)
    assert out.shape == data.shape


def test_compress_batch_uint16_count(tmp_path):
    """ADVICE: the image count was a single byte (>255 images raised at
    encode). Now uint16 with an explicit guard."""
    codec = _tiny_codec()
    imgs = [np.random.default_rng(i).random((32, 32, 3)).astype(np.float32)
            for i in range(2)]
    blob = codec.compress_batch(imgs)
    assert int.from_bytes(blob[1:3], "big") == 2
    out = codec.decompress_batch(blob)
    assert len(out) == 2

    with pytest.raises(ValueError, match="65535"):
        codec.compress_batch([np.zeros((2, 2, 3), np.float32)] * 65536)


def test_detection_map_excludes_zero_gt_classes():
    """ADVICE (medium): classes with no ground truth must not enter the AP
    mean (COCO convention) — a spurious detection on an absent class
    previously dragged task_map down with an AP=0 entry."""
    from cbench_basic_tpu.bench.task_metrics import ObjectDetectionMAPMetric

    gt = [{"boxes": np.array([[0, 0, 10, 10.0]]), "classes": np.array([0])}]

    def detector(img):
        return {"boxes": np.array([[0, 0, 10, 10.0], [20, 20, 30, 30.0]]),
                "scores": np.array([0.9, 0.8]),
                "classes": np.array([0, 5])}  # class 5 has no GT

    m = ObjectDetectionMAPMetric(detector, gt)
    m(None, None, 0)
    out = m.collect_metrics()
    assert out["task_map"] == pytest.approx(1.0)
    assert out["task_ap50"] == pytest.approx(1.0)


def test_bbans_initial_bits_scale_with_latents():
    from cbench_basic_tpu.codecs.bbans import PRECISION, VAEBBANSCodec

    f = VAEBBANSCodec.__new__(VAEBBANSCodec)
    assert f._initial_words(10) == VAEBBANSCodec.INITIAL_BITS_WORDS
    big = f._initial_words(4096)
    assert big * 32 >= 4096 * PRECISION
