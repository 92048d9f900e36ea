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


def test_round3_generator_family():
    """The remaining reference generator types (param_generator.py:17-507):
    identity, bare learned tensors, grouped wrapper, monotone increasing
    vector (by-construction instead of in-place clamping), categorical /
    categorical-to-range selection weights, tensor split, index-select
    over a generator output."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbench_basic_tpu.nn import param_generators as pg

    assert pg.IdentityParameterGenerator()("x") == "x"

    m = pg.NNParameterGenerator(shape=(2, 2), init_method="ones")
    assert np.allclose(m.apply(m.init(jax.random.PRNGKey(0))), 1.0)
    none_gen = pg.NNParameterGenerator(shape=(2,), no_params=True)
    assert none_gen.apply({"params": {}}) is None

    iv = pg.IncreasingVectorGenerator(length=6, minimum=2.0, min_delta=0.25)
    params = iv.init(jax.random.PRNGKey(0))
    v = np.asarray(iv.apply(params))
    assert v[0] >= 2.0 and np.all(np.diff(v) >= 0.25 - 1e-6)
    # gradients flow (unlike a data-clamping construction)
    g = jax.grad(lambda p: jnp.sum(iv.apply(p)))(params)
    assert np.any(np.asarray(g["params"]["deltas"]) != 0)

    cat = pg.CategoricalParameterGenerator(shape=(3,), num_categories=4,
                                           default_logits=(0., 0., 5., 0.))
    p = cat.init(jax.random.PRNGKey(0), training=False)
    hard = np.asarray(cat.apply(p, training=False))
    assert np.all(hard.argmax(-1) == 2)
    soft = np.asarray(cat.apply(p, training=True,
                                rng=jax.random.PRNGKey(1)))
    assert np.allclose(soft.sum(-1), 1.0, atol=1e-5)

    c2r = pg.CategoricalToRangeGenerator(shape=(1,), num_categories=4)
    pp = c2r.init(jax.random.PRNGKey(0), training=False)
    r = np.asarray(c2r.apply(pp, logits=jnp.asarray([[0., 0., 9., 0.]]),
                             training=False))
    np.testing.assert_allclose(r, [[1, 1, 1, 0]])

    ts = pg.TensorSplitGenerator((1, 3), axis=0, postprocess="softmax")
    out = ts(jnp.arange(4.0), index=1)
    assert out.shape == (3,) and np.isclose(float(out.sum()), 1.0)

    wrap = pg.IndexSelectParameterGeneratorWrapper(
        lambda: jnp.arange(6.0).reshape(3, 2), num_choices=3,
        default_index=0)
    np.testing.assert_allclose(np.asarray(wrap(1)), [2, 3])
    assert wrap.iterate() == [0, 1, 2]

    grouped = pg.GroupedParameterGeneratorWrapper(
        [lambda **k: "a", lambda **k: "b"])
    assert grouped() == ["a", "b"]
