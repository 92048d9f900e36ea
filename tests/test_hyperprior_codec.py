"""End-to-end neural codec tests: forward RD loss, real compress/decompress
round-trip through the rANS backend, training smoke test, benchmark
integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.neural import NeuralImageCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.data.datasets import BatchedPatchLoader
from cbench_basic_tpu.nn.models import MeanScaleHyperprior, ScaleHyperprior


@pytest.fixture(scope="module", params=["scale", "mean_scale"])
def codec(request):
    # Small widths keep CPU tests fast; architecture identical to N=M=192.
    model = (ScaleHyperprior(N=32, M=48) if request.param == "scale"
             else MeanScaleHyperprior(N=32, M=48))
    c = NeuralImageCodec(model, lmbda=0.01)
    c.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return c


def test_forward_and_loss(codec):
    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(metrics["bpp"]) > 0
    out = codec.eval_forward_fn(codec.params, x)
    assert out["x_hat"].shape == x.shape


def test_compress_decompress_roundtrip(codec):
    """The decompressed image must be bit-exactly reproducible: the decoder
    reconstructs identical symbols, so compress(x) -> decompress must equal
    the quantized-latent reconstruction."""
    img = SyntheticImageDataset(1, 96, 80).get_data_at(0)  # non-aligned size
    codec.update_state()
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape and rec.dtype == np.uint8
    assert len(stream) < img.nbytes  # must actually compress

    # Determinism: same input -> same bitstream and reconstruction.
    stream2 = codec.compress(img)
    assert stream2 == stream
    np.testing.assert_array_equal(codec.decompress(stream2), rec)


def test_encoder_decoder_symbol_consistency(codec):
    """Symbols the encoder produces must round-trip through the real
    entropy coder: decode(encode(y_sym)) == y_sym for both latents."""
    img = SyntheticImageDataset(2, 64, 64).get_data_at(1)
    codec.update_state()
    x, _ = codec._prep_image(img)
    z_sym, y_sym, indexes = map(np.asarray, codec._encode_fn(codec.params, x))
    c = z_sym.shape[-1]
    z_idx = np.broadcast_to(np.arange(c, dtype=np.int32), z_sym.shape)
    z_rt = codec._z_dec.decode_with_indexes(
        codec._z_enc.encode_with_indexes(z_sym, z_idx), z_idx)
    np.testing.assert_array_equal(z_rt, z_sym)
    y_rt = codec._y_dec.decode_with_indexes(
        codec._y_enc.encode_with_indexes(y_sym, indexes), indexes)
    np.testing.assert_array_equal(y_rt, y_sym)


def test_training_improves_loss():
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    model = MeanScaleHyperprior(N=16, M=24)
    codec = NeuralImageCodec(model, lmbda=0.01)
    ds = SyntheticImageDataset(num_items=4, height=96, width=96)
    loader = BatchedPatchLoader(ds, batch_size=8, patch_size=64, steps_per_epoch=6)
    trainer = NeuralCodecTrainer(dataloader=loader, num_epochs=1, log_every=3,
                                 data_parallel=True)

    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x0 = jnp.asarray(next(iter(loader)))
    loss_before, _ = codec.loss_fn(codec.params, x0, jax.random.PRNGKey(9))
    trainer.train_module(codec)
    loss_after, _ = codec.loss_fn(codec.params, x0, jax.random.PRNGKey(9))
    assert float(loss_after) < float(loss_before)

    # Post-training: tables rebuild and coding still round-trips.
    img = ds.get_data_at(0)
    codec.update_state()
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape


def test_trainer_checkpoint_resume(tmp_path):
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    model = ScaleHyperprior(N=8, M=12)
    codec = NeuralImageCodec(model)
    ds = SyntheticImageDataset(num_items=2, height=64, width=64)
    loader = BatchedPatchLoader(ds, batch_size=2, patch_size=64, steps_per_epoch=2)
    trainer = NeuralCodecTrainer(dataloader=loader, num_epochs=1,
                                 output_dir=str(tmp_path), data_parallel=False)
    trainer.train_module(codec)
    assert (tmp_path / "last_ckpt.pkl").exists()
    assert (tmp_path / "params.pkl").exists()
    # Resume with more epochs picks up from the checkpoint.
    trainer2 = NeuralCodecTrainer(dataloader=loader, num_epochs=2,
                                  output_dir=str(tmp_path), data_parallel=False)
    codec2 = NeuralImageCodec(ScaleHyperprior(N=8, M=12))
    metrics = trainer2.train_module(codec2)
    assert "loss" in metrics


def test_neural_codec_in_benchmark(tmp_path):
    from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark

    model = ScaleHyperprior(N=16, M=24)
    codec = NeuralImageCodec(model)
    codec.init_params(jax.random.PRNGKey(0))
    ds = SyntheticImageDataset(num_items=1, height=128, width=128)
    bench = BasicCompressionBenchmark(codec=codec, dataloader=ds,
                                      output_dir=str(tmp_path))
    out = bench.run_benchmark(run_training=False)
    assert out["compression_ratio"] < 1.0
    assert out["psnr"] > 5
