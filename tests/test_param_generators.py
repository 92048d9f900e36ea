"""Parameter-generator framework (param_generator.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.nn.param_generators import (
    BernoulliParameterGenerator,
    ConvPredictorParameterGenerator,
    IndexParameterGenerator,
    IndexSelectParameterGenerator,
    TransformerPredictorParameterGenerator,
)


def test_index_generator_contract():
    g = IndexParameterGenerator([16, 24, 32], default_index=-1)
    assert g() == 32 and g(0) == 16
    assert (g.min_sample, g.max_sample) == (0, 2)
    assert g.iterate() == [0, 1, 2]
    g.fix_for_inference = True
    assert g.iterate() == [2]
    s = g.sample(np.random.default_rng(0))
    assert 0 <= s <= 2


def test_index_select_generator_slices_bank():
    bank = jnp.arange(12.0).reshape(3, 4)
    g = IndexSelectParameterGenerator(bank, axis=0, default_index=1)
    np.testing.assert_array_equal(np.asarray(g()), np.arange(4, 8))
    np.testing.assert_array_equal(np.asarray(g(2)), np.arange(8, 12))


def test_bernoulli_generator_st_and_eval():
    gen = BernoulliParameterGenerator(num_slots=8, init_logit=0.0)
    params = gen.init(jax.random.PRNGKey(0), rng=jax.random.PRNGKey(1))
    hard = gen.apply(params, rng=jax.random.PRNGKey(2), training=True)
    assert set(np.unique(np.asarray(hard))) <= {0.0, 1.0}
    # gradient flows to the logits through the ST estimator
    g = jax.grad(lambda p: jnp.sum(gen.apply(
        p, rng=jax.random.PRNGKey(3), training=True)))(params)
    assert float(jnp.abs(g["params"]["gate_logits"]).sum()) > 0
    ev = gen.apply(params, training=False)
    assert set(np.unique(np.asarray(ev))) <= {0.0, 1.0}


def test_nn_predictor_generators_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 6))
    conv = ConvPredictorParameterGenerator(out_channels=5, hidden=16, depth=1)
    p = conv.init(jax.random.PRNGKey(1), x)
    assert conv.apply(p, x).shape == (1, 8, 8, 5)

    tr = TransformerPredictorParameterGenerator(out_channels=5, dim_embed=16,
                                                depth=1, heads=2)
    p2 = tr.init(jax.random.PRNGKey(2), x)
    assert tr.apply(p2, x).shape == (1, 8, 8, 5)
