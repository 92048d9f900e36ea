"""Distribution-grid entropy coders (dist_entropy.py parity).

Grid selection + truncated PMF rows + rANS round-trip for gaussian and
logistic kinds, and the k-means clustered variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.dist_coders import (
    DistributionGridCoder,
    VQClusteredCoder,
)
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import FactorizedCoder, LossyDummyCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    SynthesisTransform,
)


def _hyperprior_graph(y_coder, M=12, N=16, prior_mult=2):
    model = LatentGraphModel(
        node_coders={"x": LossyDummyCoder(lmbda=0.01), "y": y_coder,
                     "z": FactorizedCoder(N)},
        edges={"x_y": AnalysisTransform(N, M, num_stages=3),
               "y_z": HyperAnalysisTransform(N, use_abs=False),
               "z_y": HyperSynthesisTransform(N, out_channels=prior_mult * M),
               "y_x": SynthesisTransform(N, num_stages=3)},
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"))
    specs = {"x": (3, 1), "y": (M, 8), "z": (N, 32)}
    return model, specs


@pytest.mark.parametrize("kind", ["gaussian", "logistic"])
def test_grid_coder_roundtrip(kind):
    coder = DistributionGridCoder(channels=12, kind=kind, loc_bins=4,
                                  scale_bins=16)
    model, specs = _hyperprior_graph(coder)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    x = jnp.asarray(SyntheticImageDataset(1, 32, 32).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream

    # rate sanity vs the NN estimate
    out = codec.eval_forward_fn(codec.params, codec._prep_image(img)[0])
    est = float(sum(jnp.sum(-jnp.log2(l))
                    for l in out["likelihoods"].values()))
    assert len(stream) * 8 < est * 2.0 + 2048


def test_grid_select_prefers_nearest_scale():
    coder = DistributionGridCoder(channels=2, loc_bins=4, scale_bins=8,
                                  scale_min=0.1, scale_max=10.0)
    params = coder.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 2, 2)),
                        prior=jnp.zeros((1, 2, 2, 4)), training=False)
    # prior = (scales, means): scale at the min edge -> scale_bin 0;
    # at the max edge -> scale_bin 7
    prior = jnp.concatenate([
        jnp.full((1, 2, 2, 2), 0.1), jnp.zeros((1, 2, 2, 2))], -1)
    idx, loc_int = coder.apply(params, prior,
                               method=DistributionGridCoder.coding_params)
    assert int(np.asarray(idx).min()) % 8 == 0
    prior_hi = jnp.concatenate([
        jnp.full((1, 2, 2, 2), 10.0), jnp.zeros((1, 2, 2, 2))], -1)
    idx_hi, _ = coder.apply(params, prior_hi,
                            method=DistributionGridCoder.coding_params)
    assert int(np.asarray(idx_hi).min()) % 8 == 7
    # integer part of the mean is removed from symbols
    prior_m = jnp.concatenate([
        jnp.ones((1, 2, 2, 2)), jnp.full((1, 2, 2, 2), 3.2)], -1)
    syms = coder.apply(params, jnp.full((1, 2, 2, 2), 5.0), prior_m,
                       method=DistributionGridCoder.symbols)
    assert np.all(np.asarray(syms) == 2)  # round(5 - round(3.2)) = 2


def test_mixture_clustered_coder_roundtrip_and_fit():
    from cbench_basic_tpu.graph.dist_coders import MixtureClusteredCoder

    K = 2
    coder = MixtureClusteredCoder(channels=12, num_components=K,
                                  kind="logistic", symbol_half_range=24)
    model, specs = _hyperprior_graph(coder, prior_mult=3 * K)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))

    x = jnp.asarray(SyntheticImageDataset(1, 32, 32).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # gradient reaches the hyper-synthesis producing the mixture params
    g = jax.grad(lambda p: codec.loss_fn(p, x, jax.random.PRNGKey(2))[0])(
        codec.params)
    gn = sum(float(jnp.abs(l).sum())
             for l in jax.tree_util.tree_leaves(g["edges_z_y"]))
    assert gn > 0

    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream

    # k-means fitting over observed mixture params produces usable tables
    rs = np.random.RandomState(0)
    w = rs.dirichlet(np.ones(K), 512)
    fr = rs.uniform(-0.5, 0.5, (512, K))
    sc = np.exp(rs.uniform(np.log(0.2), np.log(4.0), (512, K)))
    cents = MixtureClusteredCoder.fit_clusters(w, fr, sc, num_clusters=16)
    assert cents.shape == (16, 3 * K)
    coder2 = MixtureClusteredCoder(channels=12, num_components=K,
                                   cluster_params=tuple(map(tuple, cents)))
    model2, specs2 = _hyperprior_graph(coder2, prior_mult=3 * K)
    codec2 = LatentGraphCodec(model2, specs2, alignment=32)
    codec2.init_params(jax.random.PRNGKey(3), input_shape=(1, 32, 32, 3))
    rec2 = codec2.decompress(codec2.compress(img))
    assert rec2.shape == img.shape


def test_vq_clustered_coder_fit_and_roundtrip():
    fr = np.random.RandomState(0).uniform(-0.5, 0.5, 4096)
    sc = np.exp(np.random.RandomState(1).uniform(np.log(0.1), np.log(4.0),
                                                 4096))
    clusters = VQClusteredCoder.fit_clusters(fr, sc, num_clusters=16)
    assert clusters.shape == (16, 2)
    assert np.all(clusters[:, 1] > 0)

    coder = VQClusteredCoder(channels=12, num_clusters=16,
                             cluster_params=tuple(map(tuple, clusters)))
    model, specs = _hyperprior_graph(coder)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape
