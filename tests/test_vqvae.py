"""VQ-VAE model family: forward/EMA training step, codec round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.nn.models.vqvae import VQVAE


def test_vqvae_training_step_and_roundtrip():
    model = VQVAE(hidden=16, dim=8, num_codes=32)
    codec = VQVAECodec(model)
    codec.init_params(jax.random.PRNGKey(0))

    ds = SyntheticImageDataset(2, 64, 64)
    x = jnp.stack([jnp.asarray(ds.get_data_at(i), jnp.float32) / 255.0
                   for i in range(2)])

    tx = optax.adam(1e-3)
    opt_state = tx.init(codec.params)

    @jax.jit
    def step(params, vq_stats, opt_state, x, rng):
        def loss(p):
            out, mut = codec.model.apply(
                {"params": p, "vq_stats": vq_stats}, x, training=True,
                mutable=["vq_stats"])
            num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
            bpp = sum(jnp.sum(-jnp.log2(l))
                      for l in out["likelihoods"].values()) / num_pixels
            total = bpp + sum(out["losses"].values())
            return total, (mut["vq_stats"], out)
        (l, (new_stats, out)), grads = jax.value_and_grad(
            loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, l

    losses = []
    rng = jax.random.PRNGKey(1)
    params, vq_stats = codec.params, codec.vq_stats
    for i in range(8):
        rng, sub = jax.random.split(rng)
        params, vq_stats, opt_state, l = step(params, vq_stats, opt_state, x, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    codec.params, codec.vq_stats = params, vq_stats

    # Real coding round trip: decode(encode(x)) reproduces the quantized
    # reconstruction deterministically.
    img = ds.get_data_at(0)
    codec.update_state()
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape and rec.dtype == np.uint8
    assert stream == codec.compress(img)
    rec2 = codec.decompress(stream)
    np.testing.assert_array_equal(rec, rec2)
    # Rate sanity: at most log2(num_codes) bits per latent element + overhead.
    n_latents = (64 // 4) ** 2
    assert len(stream) * 8 <= n_latents * np.log2(32) * 1.5 + 256


import pytest


@pytest.mark.parametrize("quantizer", ["ema", "gssoft", "pyramid", "multi"])
def test_vqvae_codec_roundtrip_all_quantizers(quantizer):
    """Every quantizer family must CODE, not just train: gssoft needs a
    shared-codebook lookup (setup-style module), pyramid/multi emit LISTS
    of index maps that the codec concatenates into one symbol stream and
    splits back via index_map_shapes (found by the nn.py CLI sweep:
    'VQEmbeddingGSSoft object has no attribute lookup')."""
    codec = VQVAECodec(VQVAE(hidden=8, dim=8, num_codes=16,
                             quantizer=quantizer),
                       alignment=16 if quantizer == "pyramid" else 4)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    img = (np.random.default_rng(3).random((37, 45, 3)) * 255).astype(
        np.uint8)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape and rec.dtype == np.uint8
    # decode determinism: same stream -> same reconstruction
    np.testing.assert_array_equal(rec, codec.decompress(stream))


def test_train_self_multi_map_quantizer():
    """vqvae_selftrain_sp path: train_self must work for quantizers that
    emit index-map LISTS (no "likelihoods" entry — bpp comes from
    metrics.code_bits; found by the full nn.py sweep)."""
    from cbench_basic_tpu.data.datasets import (
        BatchedPatchLoader,
        SyntheticImageDataset,
    )

    codec = VQVAECodec(VQVAE(hidden=8, dim=8, num_codes=16,
                             quantizer="multi"))
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    class _T:
        dataloader = BatchedPatchLoader(
            SyntheticImageDataset(num_items=2, height=32, width=32),
            batch_size=2, patch_size=32, steps_per_epoch=2)
        num_epochs = 1
        learning_rate = 1e-3
        seed = 0

    codec.set_trainer(_T())
    out = codec.train_self()
    assert np.isfinite(out["loss"]) and np.isfinite(out["bpp"])
