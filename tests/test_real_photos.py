"""Real-data RD validation on bundled photographs.

Zero-egress environments have no Kodak/ImageNet, but installed packages
ship genuine photos (sklearn china/flower, matplotlib grace_hopper). These
tests are the first time the RD/BD pipeline touches real photographic
data: classical-codec RD curves behave as published (WebP beats JPEG in
BD-rate), the benchmark's bd_reference_pts wiring reproduces the direct
bj_delta computation, and a neural codec trained on real patches improves
real held-out PSNR through the actual compress/decompress path.

Parity gate: reference Kodak evaluation wiring in
configs/lossy_graph_scalable_exp.py:78-84 (BD anchor over (rate, PSNR)
points collected by the benchmark loop, basic_benchmark.py:976-990).
"""

import jax
import numpy as np
import pytest

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.bench.metrics import BatchedImageDistortion, bj_delta
from cbench_basic_tpu.codecs import PILImageCodec
from cbench_basic_tpu.data import BundledPhotoDataset
from cbench_basic_tpu.data.datasets import BatchedPatchLoader

QUALITIES = [25, 50, 75, 90]


@pytest.fixture(scope="module")
def photos():
    ds = BundledPhotoDataset(align=64)
    if len(ds) < 3:
        pytest.skip("no bundled photos in this environment")
    return ds


def test_bundled_photo_dataset(photos):
    assert len(photos) >= 3
    seen = []
    for img in photos.iterate():
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
        assert img.shape[0] % 64 == 0 and img.shape[1] % 64 == 0
        assert min(img.shape[:2]) >= 256
        # Real photographs, not flat graphics: non-trivial per-channel spread.
        assert img.std() > 20
        seen.append(img.mean())
    # Distinct images.
    assert len(set(np.round(seen, 3))) == len(seen)


def _rd_points(fmt, photos, tmp_path):
    codec = PILImageCodec(fmt, qualities=QUALITIES)
    bench = BasicCompressionBenchmark(
        codec=codec, dataloader=photos,
        output_dir=str(tmp_path / fmt.lower()))
    out = bench.run_benchmark(run_training=False)
    R = [out[f"vrlevel{i}_compressed_length"] for i in range(len(QUALITIES))]
    Q = [out[f"vrlevel{i}_psnr"] for i in range(len(QUALITIES))]
    return R, Q


def test_classical_rd_curves_on_real_photos(photos, tmp_path):
    jR, jQ = _rd_points("JPEG", photos, tmp_path)
    wR, wQ = _rd_points("WEBP", photos, tmp_path)

    # Monotone RD on real data; sane absolute levels for photographs.
    assert all(a < b for a, b in zip(jR, jR[1:]))
    assert all(a < b for a, b in zip(jQ, jQ[1:]))
    assert 28 < jQ[-1] < 50          # JPEG q90 on real photos
    npix = sum(im.shape[0] * im.shape[1] for im in photos.iterate())
    bpp_j90 = jR[-1] * 8 / (npix / len(photos))
    assert 0.3 < bpp_j90 < 6.0

    # WebP saves rate over JPEG at matched quality on real photos
    # (positive bd = first curve better; published savings are ~20-40%).
    bd = bj_delta(wR, wQ, jR, jQ, mode=1)
    assert bd > 5.0, f"WebP should beat JPEG on real photos, bd={bd:.2f}%"

    # The benchmark's own BD wiring must reproduce the direct computation.
    codec = PILImageCodec("WEBP", qualities=QUALITIES)
    bench = BasicCompressionBenchmark(
        codec=codec, dataloader=photos, bd_reference_pts=(jR, jQ),
        output_dir=str(tmp_path / "webp_bd"))
    out = bench.run_benchmark(run_training=False)
    assert abs(out["bd_rate"] - bd) < 1e-6


def test_neural_codec_trains_on_real_photos(tmp_path):
    """Short-train a small hyperprior on real patches (china/flower), then
    compress/decompress a real held-out crop (grace_hopper) through the
    actual rANS path: trained PSNR must beat the untrained init."""
    from cbench_basic_tpu.codecs.neural import NeuralImageCodec
    from cbench_basic_tpu.nn.models import MeanScaleHyperprior
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    full = BundledPhotoDataset(align=64)
    if len(full) < 3:
        pytest.skip("no bundled photos in this environment")
    train_ds = BundledPhotoDataset(align=64, max_items=2)     # china, flower
    held_out = full.get_data_at(2)[:256, :256]                # grace_hopper

    codec = NeuralImageCodec(MeanScaleHyperprior(N=16, M=24), lmbda=0.03)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec.update_state()
    dist = BatchedImageDistortion(compute_ms_ssim=False)
    psnr_untrained = dist(codec.decompress(codec.compress(held_out)),
                          held_out)["psnr"]

    loader = BatchedPatchLoader(train_ds, batch_size=8, patch_size=64,
                                steps_per_epoch=30, seed=1)
    NeuralCodecTrainer(dataloader=loader, num_epochs=8, log_every=60,
                       data_parallel=False).train_module(codec)
    codec.update_state()
    stream = codec.compress(held_out)
    rec = codec.decompress(stream)
    psnr_trained = dist(rec, held_out)["psnr"]

    assert rec.shape == held_out.shape
    assert psnr_trained > psnr_untrained + 3.0, (
        f"training on real photos must improve real held-out PSNR "
        f"({psnr_untrained:.2f} -> {psnr_trained:.2f})")
    assert len(stream) < held_out.nbytes
