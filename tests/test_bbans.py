"""BB-ANS bits-back codec tests."""

import numpy as np

from cbench_basic_tpu.codecs.bbans import AnsStack, BBANSCodec, _quantized_cdf


def test_ans_stack_push_pop_inverse():
    rng = np.random.default_rng(0)
    cdfs = [_quantized_cdf(rng.random(k)) for k in (4, 16, 256)]
    stack = AnsStack([123456789] * 8)
    ops = []
    for _ in range(500):
        c = cdfs[int(rng.integers(3))]
        s = int(rng.integers(len(c) - 1))
        stack.push(s, c)
        ops.append((s, c))
    for s, c in reversed(ops):
        assert stack.pop(c) == s


def test_ans_stack_serialization():
    stack = AnsStack([1, 2, 3])
    cdf = _quantized_cdf(np.ones(7))
    stack.push(3, cdf)
    data = stack.to_bytes()
    stack2 = AnsStack.from_bytes(data)
    assert stack2.pop(cdf) == 3


def test_bbans_roundtrip_and_rate():
    rng = np.random.default_rng(1)
    from cbench_basic_tpu.codecs.bbans import MixtureBBANSModel
    # BB-ANS achieves the MARGINAL entropy -log p(x) = H(z) + H(x|z) -
    # H(z|x): use a low-marginal-entropy source (narrow components) so the
    # rate check is meaningful.
    model = MixtureBBANSModel(num_components=4, sigma=3.0)
    codec = BBANSCodec(model)
    centers = rng.choice(model.mus, size=20000)
    data = np.clip(centers + rng.normal(0, 3, 20000), 0, 255).astype(np.uint8)
    raw = data.tobytes()
    stream = codec.compress(raw)
    assert codec.decompress(stream) == raw
    # Marginal entropy ~ 2 + log2(3*sqrt(2*pi*e)) ~ 5.6 bits/byte.
    assert len(stream) < len(raw) * 0.78

    # Edge cases.
    assert codec.decompress(codec.compress(b"")) == b""
    one = bytes([255])
    assert codec.decompress(codec.compress(one)) == one


def test_vae_bbans_roundtrip_and_rate():
    """BB-ANS with a real VAE posterior (Townsend et al. construction):
    lossless round-trip and rate ~ ELBO of the model."""
    import jax
    import jax.numpy as jnp

    from cbench_basic_tpu.codecs.bbans import VAEBBANSCodec
    from cbench_basic_tpu.nn.models import VAE

    vae = VAE(latent_channels=4, hidden=(8, 16))
    shape = (16, 16, 3)
    x0 = jnp.zeros((1,) + shape)
    params = vae.init(jax.random.PRNGKey(0), x0, training=True,
                      rng=jax.random.PRNGKey(1))["params"]

    # x_sigma=1.0 makes p(x|z) near-uniform over [0,1]: even an untrained
    # decoder prices random pixels at ~8 bits, so the net-rate check below
    # isolates the bits-back redemption of the posterior bits.
    codec = VAEBBANSCodec(vae, params, shape, z_precision=5, x_sigma=1.0)
    rs = np.random.RandomState(0)
    img = (rs.rand(*shape) * 255).astype(np.uint8)

    stream = codec.compress(img)
    rec = codec.decompress(stream)
    np.testing.assert_array_equal(rec, img)  # bits-back is LOSSLESS

    # determinism
    assert codec.compress(img) == stream

    # net rate ~ raw size + KL(q||p) + fixed initial-bits header; without
    # bits-back redemption every latent would add ~z_precision extra bits.
    header = codec.INITIAL_BITS_WORDS * 4
    assert len(stream) < img.size * 1.15 + header + 64

    # a decode-only instance (fresh object, no compress call) also works
    codec2 = VAEBBANSCodec(vae, params, shape, z_precision=5, x_sigma=1.0)
    np.testing.assert_array_equal(codec2.decompress(stream), img)
