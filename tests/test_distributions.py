"""Distribution toolbox tests: discretized likelihoods sum to ~1, mixtures,
relaxed categoricals, pmf-grid export coding round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.nn.distributions import (
    categorical_kl_to_uniform,
    discretized_gaussian_likelihood,
    discretized_logistic_likelihood,
    discretized_mixture_likelihood,
    pmf_table_for_grid,
    relaxed_one_hot_categorical,
    straight_through_one_hot,
)


def test_discretized_likelihoods_normalize():
    xs = jnp.arange(-50, 51).astype(jnp.float32)
    for f in (discretized_logistic_likelihood, discretized_gaussian_likelihood):
        lik = f(xs, jnp.float32(0.3), jnp.float32(2.0))
        assert abs(float(lik.sum()) - 1.0) < 1e-3
    w = jnp.zeros((3,))
    locs = jnp.array([-5.0, 0.0, 5.0])
    scales = jnp.array([1.0, 2.0, 0.5])
    mix = discretized_mixture_likelihood(xs, w, locs, scales)
    assert abs(float(mix.sum()) - 1.0) < 1e-3


def test_relaxed_categoricals():
    rng = jax.random.PRNGKey(0)
    logits = jnp.array([2.0, 0.0, -2.0])
    soft = relaxed_one_hot_categorical(rng, logits, temperature=0.5)
    assert abs(float(soft.sum()) - 1.0) < 1e-6
    hard = straight_through_one_hot(rng, logits)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}
    # Gradient flows through ST sample.
    g = jax.grad(lambda l: straight_through_one_hot(rng, l).dot(
        jnp.array([1.0, 2.0, 3.0])))(logits)
    assert np.abs(np.asarray(g)).sum() > 0
    kl = categorical_kl_to_uniform(jnp.zeros((4,)))
    assert abs(float(kl)) < 1e-6


def test_pmf_grid_export_codes():
    from cbench_basic_tpu.coding.rans import Rans64Decoder, Rans64Encoder
    from cbench_basic_tpu.nn.entropy_models import export_cdf_tables

    locs = np.array([0.0, 1.5, -2.0])
    scales = np.array([1.0, 3.0, 0.7])
    pmf, tail, lengths, offsets = pmf_table_for_grid("logistic", locs, scales)
    cdfs, sizes, offs = export_cdf_tables(pmf, tail, lengths, offsets)

    enc = Rans64Encoder(bypass_coding=True)
    dec = Rans64Decoder(bypass_coding=True)
    enc.init_cdf_params(cdfs, sizes, offs)
    dec.init_cdf_params(cdfs, sizes, offs)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 3, 5000).astype(np.int32)
    data = np.round(locs[idx] + rng.logistic(0, 1, 5000) * scales[idx]
                    ).astype(np.int32)
    out = dec.decode_with_indexes(enc.encode_with_indexes(data, idx), idx)
    np.testing.assert_array_equal(out, data)
