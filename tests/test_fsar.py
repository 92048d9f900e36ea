"""FSAR (finite-state autoregressive) categorical entropy coder tests
(reference autoregressive.py:37-845).

The flagship check: on first-order Markov data, the trained table-FSAR codec
must produce strictly smaller real bitstreams than the trained static-prior
baseline (AR strictly better), with both round-tripping exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cbench_basic_tpu.codecs.fsar import FSARCodec, FSARModel

K = 8


def _markov_data(rng, n, s, c=1, stay=0.9):
    """Sticky first-order Markov chain over K symbols: the previous symbol
    predicts the next with prob `stay` (strong AR structure)."""
    out = np.zeros((n, s, c), np.int64)
    cur = rng.integers(0, K, (n, c))
    for t in range(s):
        switch = rng.random((n, c)) > stay
        cur = np.where(switch, rng.integers(0, K, (n, c)), cur)
        out[:, t] = cur
    return out


def _train(codec, data, steps=200, lr=5e-2):
    tx = optax.adam(lr)
    params = codec.params
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        (l, m), g = jax.value_and_grad(codec.loss_fn, has_aux=True)(
            p, jnp.asarray(data, jnp.int32))
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    for _ in range(steps):
        params, opt, loss = step(params, opt)
    codec.params = params
    codec.invalidate_coders()
    return float(loss)


@pytest.mark.parametrize("method,coder_type", [
    ("none", "rans"), ("table", "rans"), ("mlp", "rans"),
    ("table", "tans"), ("none", "tans"),
])
def test_fsar_roundtrip(method, coder_type):
    model = FSARModel(channel_dim=2, categorical_dim=K, ar_method=method,
                      ar_offsets=((-1, 0), (0, -1)) if method != "none" else ((-1, 0),))
    codec = FSARCodec(model, coder_type=coder_type)
    codec.init_params(jax.random.PRNGKey(0), sample_shape=(1, 16, 2))

    rng = np.random.default_rng(0)
    data = rng.integers(0, K, (40, 2))
    stream = codec.compress(data)
    out = codec.decompress(stream)
    np.testing.assert_array_equal(out, data)
    assert codec.compress(data) == stream


def test_fsar_ar_strictly_beats_static_prior():
    rng = np.random.default_rng(1)
    train = _markov_data(rng, 4, 512)
    test = _markov_data(rng, 1, 4096)[0]   # (4096, 1)

    static = FSARCodec(FSARModel(channel_dim=1, categorical_dim=K,
                                 ar_method="none"))
    static.init_params(jax.random.PRNGKey(0))
    _train(static, train)

    fsar = FSARCodec(FSARModel(channel_dim=1, categorical_dim=K,
                               ar_method="table", ar_offsets=((-1, 0),)))
    fsar.init_params(jax.random.PRNGKey(0))
    _train(fsar, train)

    s_static = static.compress(test)
    s_fsar = fsar.compress(test)
    np.testing.assert_array_equal(static.decompress(s_static), test)
    np.testing.assert_array_equal(fsar.decompress(s_fsar), test)

    # Static prior ~log2(8)=3 bits/sym; sticky Markov entropy ~0.9 bits/sym.
    assert len(s_fsar) < 0.6 * len(s_static), (len(s_fsar), len(s_static))

    # The NN estimate matches the real stream within a few percent.
    est_bits = fsar.estimate_bits(test) * test.size
    assert abs(len(s_fsar) * 8 - est_bits) / est_bits < 0.05


def test_fsar_mlp_matches_enumerated_table():
    """The MLP state function exported through state_table_logits must give
    the same coding behavior as evaluating the MLP per element."""
    model = FSARModel(channel_dim=1, categorical_dim=K, ar_method="mlp",
                      ar_offsets=((-1, 0),), mlp_hidden=16)
    codec = FSARCodec(model)
    codec.init_params(jax.random.PRNGKey(3))

    sym = jnp.asarray(np.random.default_rng(2).integers(0, K, (1, 32, 1)),
                      jnp.int32)
    per_elem = codec.model.apply({"params": codec.params},
                                 method=lambda m: m.logits_for(sym))
    table = codec.model.apply({"params": codec.params},
                              method=FSARModel.state_table_logits)
    states = np.asarray(codec.model.apply(
        {"params": codec.params},
        method=lambda m: m._neighbor_states(sym)[0]))
    np.testing.assert_allclose(
        np.asarray(per_elem)[0, :, 0],
        np.asarray(table)[0, states[0, :, 0]], rtol=2e-5, atol=2e-5)
