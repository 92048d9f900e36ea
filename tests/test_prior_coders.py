"""PriorCoder zoo: every coder trains inside the latent-graph engine and
every codable coder round-trips through the real rANS backend.

Parity: reference prior_coder/__init__.py families (categorical, Gaussian
embedding, stick-breaking, AR-categorical, VQ, Gaussian-VQ, SQ-VAE,
Gaussian VAE, beta-Bernoulli, hierarchical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import GaussianCoder, LossyDummyCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    SynthesisTransform,
)
from cbench_basic_tpu.prior_coders import (
    AutoregressiveCategoricalPriorCoder,
    ContinuousToVQPriorCoder,
    EmbeddingCategoricalPriorCoder,
    EmbeddingGaussianPriorCategoricalCoder,
    StochasticVQARPriorCoder,
    VQPriorStochasticVQARPriorCoder,
    BetaBernoulliGaussianPriorCoder,
    CategoricalGaussianPriorCoder,
    CategoricalPriorCoder,
    EmbeddingStandardNormalPriorCategoricalCoder,
    FlatLinearTransformCoder,
    ContinuousBernoulliARPriorCoder,
    ContinuousToDiscretePriorCoder,
    GaussianC2VQPriorCoder,
    GaussianEmbeddingCategoricalPriorCoder,
    GaussianPriorCoder,
    IGRCategoricalARPriorCoder,
    GaussianVQPriorCoder,
    Hierarchical2LayerPriorCoder,
    IGRCategoricalPriorCoder,
    LRMultivarGaussianDistributionVQPriorCoder,
    MultiChannelVQPriorCoder,
    MultiLatentPriorCoder,
    SQVAEPriorCoder,
    StickBreakingPriorCoder,
    GaussianMixturePriorCoder,
    HierarchicalPriorCoder,
    ResampledStickBreakingCategoricalPriorCoder,
    UnivarGaussianDistributionVQPriorCoder,
    VQGaussianEmbeddingPriorCoder,
    VQPriorCoder,
)

L, K, D = 3, 8, 6


def _graph_with_y_coder(coder, y_in_channels, y_out_channels,
                        y_symbol_planes):
    """x -> y graph where y is the prior coder under test."""
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=0.01), "y": coder},
        edges={"x_y": AnalysisTransform(16, y_in_channels, num_stages=3),
               "y_x": SynthesisTransform(16, num_stages=3)},
        inference_wiring=(("x_y", "x", "y"),),
        generative_wiring=(("y_x", "y", "x"),),
        generative_order=("y", "x"))
    specs = {"x": (3, 1), "y": (y_symbol_planes, 8)}
    return model, specs


CODABLE = [
    ("categorical", CategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * K, L * D, L),
    ("categorical_vimco", CategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        mc_estimator="vimco", mc_samples=3), L * K, L * D, L),
    ("gauss_embedding", GaussianEmbeddingCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * K, L * D, L),
    ("stick_breaking", StickBreakingPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * K, L * D, L),
    ("ar_categorical", AutoregressiveCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * K, L * D, L),
    # reference StickBreakingPriorCategoricalDistributionPriorCoder (:4530):
    # Beta-resampled stochastic prior at training, expected-stick coding PMF
    ("resampled_stick_breaking", ResampledStickBreakingCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * K, L * D, L),
    ("vq", VQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D), L * D, L * D, L),
    ("gaussian_vq", GaussianVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D), L * D, L * D, L),
    ("sqvae", SQVAEPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D), L * D, L * D, L),
    ("univar_gauss_dvq", UnivarGaussianDistributionVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D), L * D, L * D, L),
    ("lr_multivar_dvq", LRMultivarGaussianDistributionVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D,
        dist_rank=2), L * D, L * D, L),
    ("vq_gauss_embedding", VQGaussianEmbeddingPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D), L * D, L * D, L),
    ("multichannel_vq", MultiChannelVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D,
        use_st_gumbel=True), L * D, L * D, L),
    ("multichannel_vq_shared", MultiChannelVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D,
        channels_share_codebook=True, input_variance=0.05,
        embedding_variance=0.01), L * D, L * D, L),
    ("multichannel_vq_ar", MultiChannelVQPriorCoder(
        num_groups=L, num_embeddings=K, embedding_dim=D,
        use_autoregressive_prior=True), L * D, L * D, L),
    ("igr_ar_categorical", IGRCategoricalARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
     L * 2 * (K - 1), L * D, L),
    ("igr_categorical", IGRCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
     L * 2 * (K - 1), L * D, L),
    ("continuous_to_discrete", ContinuousToDiscretePriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
     L * 2 * D, L * D, L),
    ("gaussian_c2vq", GaussianC2VQPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
     L * 2 * D, L * D, L),
    ("categorical_gaussian", CategoricalGaussianPriorCoder(
        latent_dims=L, num_embeddings=K), L * K, L, L),
    ("embedding_std_normal", EmbeddingStandardNormalPriorCategoricalCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * K, L * D, L),
    # round-3 zoo tail (reference :1878-2334, :2744, :4462)
    ("stochastic_vq_ar", StochasticVQARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D), L * D, L * D, L),
    ("stochastic_vq_ar_vmf", StochasticVQARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        distance_method="vmf", straight_through=True), L * D, L * D, L),
    ("stochastic_vq_ar_post", StochasticVQARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        use_ar_posterior=True, variance_per_channel=True,
        separate_update_cont_loss=True), L * D, L * D, L),
    ("vq_prior_stochastic_vq", VQPriorStochasticVQARPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        num_prior_codes=4), L * D, L * D, L),
    ("continuous_to_vq", ContinuousToVQPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D),
     L * 2 * D, L * D, L),
    ("continuous_to_vq_random", ContinuousToVQPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        blend_mode="random", relax_temp=0.3), L * 2 * D, L * D, L),
    ("embedding_gmm_prior", EmbeddingGaussianPriorCategoricalCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        gaussian_mixture_dim=4), L * K, L * D, L),
    # reference EmbeddingCategoricalDistributionPriorCoder (:4338) knobs
    ("embedding_categorical", EmbeddingCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        embedding_variance=0.01, embedding_variance_trainable=True,
        use_embedding_variance_entropy=True), L * K, L * D, L),
    ("embedding_categorical_onehot", EmbeddingCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D,
        one_hot_initialization=True, fix_embedding=True), L * K, L * K, L),
]


@pytest.mark.parametrize("name,coder,cin,cout,planes", CODABLE,
                         ids=[c[0] for c in CODABLE])
def test_codable_prior_coder_train_and_roundtrip(name, coder, cin, cout, planes):
    model, specs = _graph_with_y_coder(coder, cin, cout, planes)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    # Training forward: finite loss, gradient reaches the coder params.
    x = jnp.asarray(SyntheticImageDataset(1, 32, 32).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), metrics
    grads = jax.grad(lambda p: codec.loss_fn(p, x, jax.random.PRNGKey(2))[0])(
        codec.params)
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads["node_coders_y"]))
    assert gnorm > 0

    # Real coding round-trip: deterministic stream, compat mode.
    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream

    # Rate sanity: coded length ~ sum of -log2 prior likelihood + overhead.
    out = codec.eval_forward_fn(codec.params, codec._prep_image(img)[0])
    est_bits = float(jnp.sum(-jnp.log2(out["likelihoods"]["y"])))
    assert len(stream) * 8 < est_bits * 1.5 + 512


ESTIMATE_ONLY = [
    ("gaussian_vae", GaussianPriorCoder(channels=8), 16, 8),
    # reference GaussianDistributionPriorCoder (:2909): mixture/VAMP prior
    ("gaussian_mixture", GaussianMixturePriorCoder(
        channels=8, num_prior_components=4), 16, 8),
    ("beta_bernoulli", BetaBernoulliGaussianPriorCoder(channels=8), 24, 8),
    ("continuous_bernoulli_ar", ContinuousBernoulliARPriorCoder(
        latent_dims=8), 8, 8),
    ("multi_latent", MultiLatentPriorCoder(
        coders=(VQPriorCoder(num_groups=2, num_embeddings=K, embedding_dim=D),
                GaussianPriorCoder(channels=4)),
        split_sizes=(2 * D, 8)), 2 * D + 8, 2 * D + 4),
    ("flat_linear_vq", FlatLinearTransformCoder(
        inner=VQPriorCoder(num_groups=2, num_embeddings=K, embedding_dim=D),
        out_channels=10), 10, 10),
]


@pytest.mark.parametrize("name,coder,cin,cout", ESTIMATE_ONLY,
                         ids=[c[0] for c in ESTIMATE_ONLY])
def test_variational_coder_trains_in_graph(name, coder, cin, cout):
    model, specs = _graph_with_y_coder(coder, cin, cout, cout)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    x = jnp.asarray(SyntheticImageDataset(1, 32, 32).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert metrics["bpp"] >= 0  # exp(-KL) likelihoods -> ELBO rate


def test_categorical_prior_rate_reflects_pmf():
    """Rate sanity: a peaked prior makes frequent symbols cheap — training a
    few steps on constant data must reduce the y rate."""
    import optax

    coder = CategoricalPriorCoder(latent_dims=L, num_embeddings=K,
                                  embedding_dim=D)
    model, specs = _graph_with_y_coder(coder, L * K, L * D, L)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5

    tx = optax.adam(5e-3)
    params = codec.params
    opt = tx.init(params)

    @jax.jit
    def step(p, o, rng):
        (l, m), g = jax.value_and_grad(
            lambda p: codec.loss_fn(p, x, rng), has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, m["bpp"]

    rng = jax.random.PRNGKey(3)
    bpp0 = None
    for i in range(30):
        rng, sub = jax.random.split(rng)
        params, opt, bpp = step(params, opt, sub)
        if bpp0 is None:
            bpp0 = float(bpp)
    assert float(bpp) < bpp0


def test_hierarchical_wrapper_and_graph_coding():
    """The hierarchical wrapper trains as one node; the same hierarchy
    expressed as graph nodes (hierarchical_graph_nodes) really codes."""
    from cbench_basic_tpu.prior_coders import hierarchical_graph_nodes
    from flax import linen as nn

    M = 8
    inner = VQPriorCoder(num_groups=2, num_embeddings=8, embedding_dim=4)
    down = nn.Conv(2 * 4, (3, 3), strides=(2, 2), padding="SAME")
    up = nn.ConvTranspose(2 * M, (3, 3), strides=(2, 2), padding="SAME")
    outer = GaussianCoder(M, mean_scale=True)

    # (a) single-module wrapper: training forward with combined likelihoods
    wrapper = Hierarchical2LayerPriorCoder(
        outer=outer, inner=inner, down=down, up=up)
    y = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, M))
    params = wrapper.init(jax.random.PRNGKey(1), y, training=True,
                          rng=jax.random.PRNGKey(2))["params"]
    out = wrapper.apply({"params": params}, y, training=True,
                        rng=jax.random.PRNGKey(3))
    assert out["likelihood"].shape[0] == 2
    assert np.all(np.isfinite(np.asarray(out["likelihood"])))
    assert any(k.startswith("loss_") for k in out)

    # (b) graph form: x -> y -> h with VQ hyper — real compress/decompress.
    pieces = hierarchical_graph_nodes(
        "y", "h", GaussianCoder(M, mean_scale=True),
        VQPriorCoder(num_groups=2, num_embeddings=8, embedding_dim=4),
        nn.Conv(2 * 4, (3, 3), strides=(2, 2), padding="SAME"),
        nn.ConvTranspose(2 * M, (3, 3), strides=(2, 2), padding="SAME"))
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=0.01),
                     **pieces["node_coders"]},
        edges={"x_y": AnalysisTransform(16, M, num_stages=3),
               "y_x": SynthesisTransform(16, num_stages=3),
               **pieces["edges"]},
        inference_wiring=(("x_y", "x", "y"),) + pieces["inference_wiring"],
        generative_wiring=pieces["generative_wiring"] + (("y_x", "y", "x"),),
        generative_order=pieces["generative_order"] + ("x",))
    specs = {"x": (3, 1), "y": (M, 8), "h": (2, 16)}
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream


def test_hierarchical_n_layer_coder():
    """Generic N-layer hierarchy (reference HierarchicalNNPriorCoder
    :103-222): 3 layers, combined likelihoods, inner losses surfaced,
    gradients reach every layer's coder."""
    from flax import linen as nn

    M = 8
    # layer latents: 8ch @8x8 -> 4ch @4x4 -> VQ(2 groups x dim 2) @2x2;
    # decoders emit the NEXT-OUTER layer's (mean, scale) prior features.
    coder = HierarchicalPriorCoder(
        coders=(GaussianCoder(M, mean_scale=True),
                GaussianCoder(4, mean_scale=True),
                VQPriorCoder(num_groups=2, num_embeddings=8,
                             embedding_dim=2)),
        encoders=(nn.Conv(4, (3, 3), strides=(2, 2), padding="SAME"),
                  nn.Conv(4, (3, 3), strides=(2, 2), padding="SAME")),
        decoders=(nn.ConvTranspose(2 * M, (3, 3), strides=(2, 2),
                                   padding="SAME"),
                  nn.ConvTranspose(2 * 4, (3, 3), strides=(2, 2),
                                   padding="SAME")))
    y = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, M))
    params = coder.init(jax.random.PRNGKey(1), y, training=True,
                        rng=jax.random.PRNGKey(2))["params"]
    out = coder.apply({"params": params}, y, training=True,
                      rng=jax.random.PRNGKey(3))
    assert out["value_hat"].shape == (2, 8, 8, M)
    # likelihood concatenates ALL THREE layers (outer + mid + inner)
    n_outer = 8 * 8 * M
    assert out["likelihood"].shape == (2, n_outer + 4 * 4 * 4 + 2 * 2 * 2)
    assert np.all(np.isfinite(np.asarray(out["likelihood"])))
    assert any(k.endswith("_l2") for k in out if k.startswith("loss_"))

    # rate gradient reaches every layer
    def rate(p):
        o = coder.apply({"params": p}, y, training=True,
                        rng=jax.random.PRNGKey(4))
        return jnp.sum(-jnp.log(o["likelihood"]))

    g = jax.grad(rate)(params)
    # GaussianCoders are parameterless (their prior arrives via the
    # decoders); the rate gradient must reach the inner VQ codebook AND
    # both inter-layer transforms (i.e. flow through the whole hierarchy).
    for sub in ("coders_2", "encoders_0", "encoders_1", "decoders_1"):
        gn = sum(float(jnp.abs(x).sum())
                 for x in jax.tree_util.tree_leaves(g[sub]))
        assert gn > 0, sub


def test_gaussian_mixture_vamp_prior():
    """VAMP update (reference set_vamp_posterior :2934): installing
    components at the posterior tightens the rate vs the cold prior."""
    coder = GaussianMixturePriorCoder(channels=4, num_prior_components=8)
    val = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8)) * 3.0
    params = coder.init(jax.random.PRNGKey(1), val, training=False)["params"]

    out_cold = coder.apply({"params": params}, val, training=False)
    new_leaves = coder.apply({"params": params}, val,
                             method="set_vamp_posterior")
    assert new_leaves["prior_means"].shape == (8,)
    params2 = dict(params, **new_leaves)
    out_vamp = coder.apply({"params": params2}, val, training=False)

    # same posterior, better-matched prior -> strictly more likelihood mass
    rate = lambda o: float(jnp.sum(-jnp.log(o["likelihood"])))
    assert rate(out_vamp) < rate(out_cold)
    # training path: finite, rng-driven
    out_tr = coder.apply({"params": params2}, val, training=True,
                         rng=jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(out_tr["likelihood"])))


def test_resampled_stick_breaking_prior_statistics():
    """The training prior is stochastic (different rng -> different PMF)
    but coding tables are deterministic and match the expected-stick PMF."""
    coder = ResampledStickBreakingCategoricalPriorCoder(
        latent_dims=L, num_embeddings=K, embedding_dim=D)
    val = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, L * K))
    params = coder.init(jax.random.PRNGKey(1), val, training=True,
                        rng=jax.random.PRNGKey(2))["params"]

    lik = lambda seed: np.asarray(coder.apply(
        {"params": params}, val, training=True,
        rng=jax.random.PRNGKey(seed))["likelihood"])
    # stochastic prior: training likelihoods vary with rng beyond the
    # gumbel sampling (two draws differ)
    assert not np.allclose(lik(3), lik(4))

    pmf = coder.apply({"params": params}, method="prior_pmf")
    pmf = np.asarray(pmf)
    assert pmf.shape == (L, K)
    np.testing.assert_allclose(pmf.sum(-1), 1.0, rtol=1e-5)
    # eval path is deterministic
    e1 = coder.apply({"params": params}, val, training=False)
    e2 = coder.apply({"params": params}, val, training=False)
    np.testing.assert_allclose(np.asarray(e1["likelihood"]),
                               np.asarray(e2["likelihood"]))


def test_stochastic_vq_ema_codebook_update():
    """Functional EMA step (reference :2045-2058): assigned codewords move
    toward the batch mean of their inputs; counts accumulate."""
    rng = np.random.default_rng(0)
    Lm, Km, Dm = 2, 4, 3
    emb = jnp.asarray(rng.normal(0, 1, (Lm, Km, Dm)), jnp.float32)
    count = jnp.zeros((Lm, Km))
    weight = emb.copy()
    x = jnp.asarray(rng.normal(2.0, 0.1, (64, Lm, Dm)), jnp.float32)
    onehot = jax.nn.one_hot(jnp.zeros((64, Lm), jnp.int32), Km)  # all code 0

    e2, c2, w2 = StochasticVQARPriorCoder.ema_codebook_update(
        emb, count, weight, x, onehot, decay=0.5)
    # code 0 moved toward the input mean (~2.0), others barely moved
    assert float(jnp.mean(e2[:, 0])) > float(jnp.mean(emb[:, 0]))
    assert float(c2[0, 0]) > float(c2[0, 1])
    # repeated application converges toward the batch mean
    for _ in range(20):
        e2, c2, w2 = StochasticVQARPriorCoder.ema_codebook_update(
            e2, c2, w2, x, onehot, decay=0.5)
    np.testing.assert_allclose(np.asarray(e2[:, 0]).mean(), 2.0, atol=0.2)


def test_continuous_to_vq_anneal_blends_paths():
    """relax_temp=1 -> pure continuous VAE (rate = exp(-KL), output = mean
    at eval); relax_temp=0 -> pure VQ (rate from the code prior, output =
    codewords)."""
    coder = ContinuousToVQPriorCoder(latent_dims=L, num_embeddings=K,
                                     embedding_dim=D)
    rng = np.random.default_rng(1)
    val = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 2 * L * D)), jnp.float32)
    params = coder.init(jax.random.PRNGKey(0), val, training=False)

    cont = coder.apply(params, val, training=False, relax_temp=1.0)
    disc = coder.apply(params, val, training=False, relax_temp=0.0)
    mean = val[..., :L * D]
    np.testing.assert_allclose(np.asarray(cont["value_hat"]),
                               np.asarray(mean), atol=1e-5)
    # discrete output is exactly a codeword selection
    syms = coder.apply(params, val, method=lambda m, v: m.symbols(v))
    deq = coder.apply(params, syms, method=lambda m, s: m.dequantize(s))
    np.testing.assert_allclose(np.asarray(disc["value_hat"]),
                               np.asarray(deq), atol=1e-5)
