"""MC-sampled (REINFORCE/VIMCO) learned-topogroup training
(reference pgm_coder.py:70-135, 370-539, 1498-1604).

The flagship check: on data whose only structure is a strong vertical
dependency (each row predicts the next), a VIMCO-trained learned assignment
with 4 groups must reach lower eval bpp than a fixed checkerboard (2 groups,
half the elements decode blind), because it can discover a row-phase
schedule where 3/4 of elements see their top neighbor.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cbench_basic_tpu.graph.topogroup import TopoGroupGaussianCoder

H = W = 8
C = 2


def _vertical_chain_batch(rng, n):
    """y[r] = y[r-1] + eps(0.02), y[0] ~ N(0, 8): the top neighbor is
    (almost) everything; elements without it cost ~log2(8/0.02) more bits."""
    r0 = rng.normal(0.0, 8.0, (n, 1, W, C))
    steps = rng.normal(0.0, 0.02, (n, H - 1, W, C))
    rows = np.concatenate([r0, np.cumsum(steps, 1) + r0], 1)
    return jnp.asarray(rows, jnp.float32)


def _row_prior(n):
    """Positional prior: the predictor can only discover a row-phase
    assignment if the prior carries row information."""
    r = np.arange(H)[None, :, None, None] / H
    feats = [np.sin(2 * np.pi * k * r) for k in (1, 2)]
    feats += [np.cos(2 * np.pi * k * r) for k in (1, 2)]
    p = np.concatenate([np.broadcast_to(f, (n, H, W, 1)) for f in feats], -1)
    return jnp.asarray(p, jnp.float32)


def _train_coder(coder, steps=1200, seed=0, lr=5e-3):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    batch = _vertical_chain_batch(rng, 8)
    prior = _row_prior(8)
    params = coder.init(key, batch, prior=prior, training=True,
                        rng=jax.random.PRNGKey(1))["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, y, pr, k):
        def loss_fn(p):
            out = coder.apply({"params": p}, y, prior=pr, training=True, rng=k)
            rate = jnp.mean(-jnp.log2(out["likelihood"]))
            return rate + out.get("loss_mc", 0.0), rate
        (_, rate), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = tx.update(grads, o, p)
        return optax.apply_updates(p, up), o, rate

    for i in range(steps):
        y = _vertical_chain_batch(rng, 8)
        key, sub = jax.random.split(key)
        params, opt, rate = step(params, opt, y, prior, sub)
    return params


def _eval_bpp(coder, params, seed=99):
    rng = np.random.default_rng(seed)
    y = _vertical_chain_batch(rng, 16)
    out = coder.apply({"params": params}, y, prior=_row_prior(16),
                      training=False)
    return float(jnp.mean(-jnp.log2(out["likelihood"])))


@pytest.mark.parametrize("estimator", ["reinforce", "vimco"])
def test_mc_estimator_loss_and_predictor_grads(estimator):
    coder = TopoGroupGaussianCoder(
        channels=C, pattern="learned", num_topo_groups=4,
        context_channels=16, learned_estimator=estimator, mc_samples=4)
    rng = np.random.default_rng(0)
    y = _vertical_chain_batch(rng, 2)
    prior = _row_prior(2)
    params = coder.init(jax.random.PRNGKey(0), y, prior=prior, training=True,
                        rng=jax.random.PRNGKey(1))["params"]

    def f(p):
        out = coder.apply({"params": p}, y, prior=prior, training=True,
                          rng=jax.random.PRNGKey(2))
        return jnp.mean(-jnp.log2(out["likelihood"])) + out["loss_mc"]

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    pred = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads["predictor"]))
    assert pred > 0, "score-function gradient must reach the predictor"


@pytest.mark.slow
def test_vimco_learned_beats_fixed_checkerboard():
    learned = TopoGroupGaussianCoder(
        channels=C, pattern="learned", num_topo_groups=4,
        context_channels=8, learned_estimator="vimco", mc_samples=8)
    fixed = TopoGroupGaussianCoder(
        channels=C, pattern="checkerboard", context_channels=8)

    p_learned = _train_coder(learned, steps=1200, seed=0)
    p_fixed = _train_coder(fixed, steps=1200, seed=0)

    bpp_learned = _eval_bpp(learned, p_learned)
    bpp_fixed = _eval_bpp(fixed, p_fixed)
    # Checkerboard leaves 1/2 the elements blind; a learned row-phase
    # schedule leaves ~1/4 — measured ~1.6 vs ~4.1 bpp at these settings
    # (the learned map converges to a row schedule like [3 2 2 1 1 0 2 3]).
    assert bpp_learned < bpp_fixed - 1.0, (bpp_learned, bpp_fixed)


def test_learned_multi_channel_group_coding_roundtrip():
    """Learned pattern with num_channel_groups=2 (vimco estimator): the hard
    argmax map expands per channel group and the host coding path
    round-trips."""
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.data import SyntheticImageDataset
    from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
    from cbench_basic_tpu.graph.node_coders import FactorizedCoder, LossyDummyCoder
    from cbench_basic_tpu.nn.models.hyperprior import (
        AnalysisTransform, HyperAnalysisTransform, HyperSynthesisTransform,
        SynthesisTransform)

    N, M = 8, 12
    node_coders = {
        "x": LossyDummyCoder(lmbda=0.01),
        "y": TopoGroupGaussianCoder(
            channels=M, pattern="learned", num_topo_groups=3,
            num_channel_groups=2, context_channels=24,
            learned_estimator="vimco", mc_samples=2),
        "z": FactorizedCoder(N),
    }
    edges = {
        "x_y": AnalysisTransform(N, M),
        "y_z": HyperAnalysisTransform(N, use_abs=False),
        "z_y": HyperSynthesisTransform(N, out_channels=2 * M),
        "y_x": SynthesisTransform(N),
    }
    model = LatentGraphModel(
        node_coders=node_coders, edges=edges,
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"))
    specs = {"x": (3, 1), "y": (M, 16), "z": (N, 64)}

    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "loss_mc" in metrics

    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream
