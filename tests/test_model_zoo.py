"""Model zoo: VAE, UNet, TransGAN generator + distribution toolbox breadth.

Parity: reference nn/models/vae.py, unet.py, transgan_generator.py and
nn/distributions/relaxed.py (asymptotic/double/IGR relaxations, mixture
rsample).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.nn.models import (
    VAE,
    GeneratorUNet,
    TransGANGenerator,
)


def test_vae_elbo_parts_and_determinism():
    vae = VAE(latent_channels=8, hidden=(8, 16))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(1), x, training=True,
                      rng=jax.random.PRNGKey(2))["params"]
    out = vae.apply({"params": params}, x, training=True,
                    rng=jax.random.PRNGKey(3))
    assert out["x_hat"].shape == x.shape
    assert out["kl"].shape == (2,)
    assert np.all(np.asarray(out["kl"]) >= 0)
    # eval forward is deterministic (z = mu)
    e1 = vae.apply({"params": params}, x, training=False)
    e2 = vae.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(np.asarray(e1["x_hat"]),
                                  np.asarray(e2["x_hat"]))


def test_unet_shapes():
    net = GeneratorUNet(out_channels=3, features=(8, 16, 32))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == (1, 32, 32, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_transgan_generator_grows_resolution():
    gen = TransGANGenerator(bottom_width=4, embed_dim=64, depths=(1, 1, 1),
                            heads=2)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    params = gen.init(jax.random.PRNGKey(1), z)
    img = gen.apply(params, z)
    # 4 -> 8 -> 16 after two pixel-shuffle stages
    assert img.shape == (2, 16, 16, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0


def test_vq_embedding_variants():
    from cbench_basic_tpu.nn.models import (
        MultiVectorQuantizerWrapper,
        PyramidVQEmbedding,
        VQEmbeddingGSSoft,
    )

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))

    gs = VQEmbeddingGSSoft(num_codes=32, dim=16)
    p = gs.init(jax.random.PRNGKey(1), z, training=True,
                rng=jax.random.PRNGKey(2))
    q, idx, kl = gs.apply(p, z, training=True, rng=jax.random.PRNGKey(3))
    assert q.shape == z.shape and idx.shape == z.shape[:-1]
    assert float(kl) >= 0
    qe, _, _ = gs.apply(p, z, training=False)
    assert qe.shape == z.shape

    pyr = PyramidVQEmbedding(num_codes=16, dim=16, num_scales=3)
    p2 = pyr.init(jax.random.PRNGKey(4), z)
    recon, idx_maps, loss = pyr.apply(p2, z)
    assert recon.shape == z.shape and len(idx_maps) == 3
    assert idx_maps[0].shape == (2, 8, 8)      # finest scale
    assert idx_maps[-1].shape == (2, 2, 2)     # coarsest scale
    assert np.isfinite(float(loss))

    mv = MultiVectorQuantizerWrapper(num_quantizers=2, num_codes=16, dim=8)
    vars2 = mv.init(jax.random.PRNGKey(5), z)
    (q3, idxs, l3), _ = mv.apply(vars2, z, training=True,
                                 mutable=["vq_stats"])
    assert q3.shape == z.shape and len(idxs) == 2


def test_relaxed_distribution_samples():
    from cbench_basic_tpu.nn.distributions import (
        asymptotic_relaxed_one_hot,
        double_relaxed_one_hot,
        invertible_gaussian_one_hot,
        mixture_rsample,
        softmax_pp,
    )

    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    for fn in (asymptotic_relaxed_one_hot, double_relaxed_one_hot):
        s = fn(jax.random.PRNGKey(0), logits)
        assert s.shape == logits.shape
        np.testing.assert_allclose(np.asarray(jnp.sum(s, -1)), 1.0, atol=1e-5)

    # asymptotic: tg -> 0 recovers the deterministic softmax
    s0 = asymptotic_relaxed_one_hot(jax.random.PRNGKey(1), logits,
                                    temperature=1.0, temperature_gumbel=1e-6)
    np.testing.assert_allclose(np.asarray(s0),
                               np.asarray(jax.nn.softmax(logits, -1)),
                               atol=1e-4)

    # softmax++ sums to 1 with a positive remainder coordinate
    y = jnp.asarray([[0.5, -0.5]])
    sp = softmax_pp(y, tau=1.0, delta=1.0)
    assert sp.shape == (1, 3)
    np.testing.assert_allclose(float(jnp.sum(sp)), 1.0, atol=1e-6)
    assert float(sp[0, -1]) > 0

    ig = invertible_gaussian_one_hot(jax.random.PRNGKey(2), y,
                                     jnp.ones_like(y))
    np.testing.assert_allclose(float(jnp.sum(ig)), 1.0, atol=1e-6)

    # mixture rsample is differentiable w.r.t. locs
    locs = jnp.asarray([[0.0, 5.0]])
    g = jax.grad(lambda l: jnp.sum(mixture_rsample(
        jax.random.PRNGKey(3), jnp.zeros((1, 2)), l,
        jnp.ones_like(l))))(locs)
    assert float(jnp.sum(jnp.abs(g))) > 0
