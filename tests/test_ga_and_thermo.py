"""GA topogroup-pattern search + thermo (TVO) estimator + custom pattern.

Parity: the reference's GA-population / thermo options for discrete PGM
training (pgm_coder.py:370-539, 1498-1604).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.graph.ga_search import GAPatternSearch


def test_thermo_estimator_loss_and_gradient():
    from cbench_basic_tpu.nn.mc_estimators import mc_loss, thermo_loss

    lw = jnp.asarray([[-10.0, -12.0, -9.0], [-20.0, -18.0, -22.0]])
    lq = jnp.asarray([[-1.0, -2.0, -1.5], [-0.5, -1.0, -2.0]])
    loss = thermo_loss(lw, lq, 3)
    assert np.isfinite(float(loss))
    assert float(mc_loss("thermo", lw, lq, 3)) == float(loss)
    g = jax.grad(lambda q: mc_loss("thermo", lw, q, 3))(lq)
    assert float(jnp.abs(g).sum()) > 0


def test_thermo_learned_topogroup_trains():
    model, specs = build_topogroup_hyperprior_graph(
        N=16, M=12, context_channels=24, y_stride=8, pattern="learned",
        learned_estimator="thermo", mc_samples=3)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: codec.loss_fn(p, x, jax.random.PRNGKey(2))[0])(
        codec.params)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(
        g["node_coders_y"]["predictor"]))
    assert np.isfinite(gn) and gn > 0  # predictor logits receive gradient


def test_custom_pattern_codes_all_modes():
    block = ((0, 1), (2, 3))
    model, specs = build_topogroup_hyperprior_graph(
        N=16, M=12, context_channels=24, y_stride=8, pattern="custom",
        custom_block=block)
    codec = LatentGraphCodec(model, specs, alignment=32, coding_mode="tpu",
                             num_lanes=64)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    codec.update_state()
    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    rec_tpu = codec.decompress(codec.compress(img))
    codec.coding_mode = "compat"
    rec_c = codec.decompress(codec.compress(img))
    np.testing.assert_array_equal(rec_tpu, rec_c)


def test_ga_search_finds_codable_pattern():
    model, specs = build_topogroup_hyperprior_graph(
        N=16, M=12, context_channels=24, y_stride=8)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    images = [SyntheticImageDataset(1, 32, 32).get_data_at(0)]

    search = GAPatternSearch(codec, images, num_groups=3, block=(2, 2),
                             population=6, generations=3, elite=2, seed=0)
    best_block, best_bits, history = search.search()
    assert np.isfinite(best_bits) and best_bits > 0
    assert len(best_block) == 2 and len(best_block[0]) == 2
    # best fitness is monotone non-increasing across generations
    vals = [history[g] for g in sorted(history)]
    assert all(b <= a + 1e-6 for a, b in zip(vals, vals[1:]))

    # the winning block drives a real codec
    m2, s2 = build_topogroup_hyperprior_graph(
        N=16, M=12, context_channels=24, y_stride=8, pattern="custom",
        custom_block=best_block)
    c2 = LatentGraphCodec(m2, s2, alignment=32)
    c2.init_params(jax.random.PRNGKey(1), input_shape=(1, 32, 32, 3))
    img = images[0]
    rec = c2.decompress(c2.compress(img))
    assert rec.shape == img.shape
