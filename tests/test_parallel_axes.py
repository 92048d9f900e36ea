"""Spatial (sp) and pipeline (pp) parallel axes on the virtual CPU mesh.

Completes the dp/tp/sp/ep/pp matrix exercised by
__graft_entry__._dryrun_multichip_body; dp/tp/ep(replica) live in
tests/test_driver_hooks.py and tests/test_round2_fixes.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cbench_basic_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipeline_train_step,
    pipeline_apply,
    stack_stage_params,
)
from cbench_basic_tpu.parallel.spatial import (
    make_spatial_mesh,
    make_spatial_step,
    spatial_device_put,
)


@pytest.fixture(scope="module")
def cpu8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest XLA_FLAGS)")
    return devs[:8]


# ---------------------------------------------------------------- spatial

def _conv_apply(params, x):
    # two stride-1 3x3 convs: halo exchange on both when H is sharded
    y = jax.lax.conv_general_dilated(
        x, params["w1"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y)
    return jax.lax.conv_general_dilated(
        y, params["w2"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_spatial_forward_matches_unsharded(cpu8):
    mesh = make_spatial_mesh(2, 4, cpu8)
    k1, k2, kx = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"w1": jax.random.normal(k1, (3, 3, 3, 8)) * 0.1,
              "w2": jax.random.normal(k2, (3, 3, 8, 3)) * 0.1}
    x = jax.random.normal(kx, (2, 32, 16, 3))

    def fwd(params, x, rng):
        return _conv_apply(params, x)

    step = make_spatial_step(fwd, mesh, n_state_args=1)
    out = step(params, spatial_device_put(x, mesh), jax.random.PRNGKey(0))
    ref = _conv_apply(params, x)
    # identical math modulo SPMD halo exchange: tight tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_spatial_train_step_runs(cpu8):
    mesh = make_spatial_mesh(2, 4, cpu8)
    k1, k2, kx = jax.random.split(jax.random.PRNGKey(1), 3)
    params = {"w1": jax.random.normal(k1, (3, 3, 3, 8)) * 0.1,
              "w2": jax.random.normal(k2, (3, 3, 8, 3)) * 0.1}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    x = jax.random.normal(kx, (2, 32, 16, 3))

    def train_step(params, opt_state, batch, rng):
        def loss(p):
            return jnp.mean((_conv_apply(p, batch) - batch) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, l

    step = make_spatial_step(train_step, mesh, n_state_args=2)
    new_params, _, l = step(params, opt_state,
                            spatial_device_put(x, mesh),
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(l))
    assert not np.allclose(np.asarray(new_params["w1"]),
                           np.asarray(params["w1"]))


# --------------------------------------------------------------- pipeline

def _stage_apply(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make_stages(key, n_stages, dim):
    ks = jax.random.split(key, n_stages)
    return [{"w": jax.random.normal(k, (dim, dim)) * 0.3,
             "b": jnp.zeros((dim,))} for k in ks]


@pytest.mark.parametrize("n_stages,n_micro", [(2, 3), (4, 5)])
def test_pipeline_apply_matches_sequential(cpu8, n_stages, n_micro):
    mesh = make_pipeline_mesh(n_stages, cpu8)
    dim = 6
    stages = _make_stages(jax.random.PRNGKey(2), n_stages, dim)
    stacked = stack_stage_params(stages)
    mbs = jax.random.normal(jax.random.PRNGKey(3), (n_micro, 4, dim))

    out = pipeline_apply(_stage_apply, stacked, mbs, mesh)

    ref = mbs
    for p in stages:
        ref = _stage_apply(p, ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trainer_spatial_parallel_option(cpu8):
    """NeuralCodecTrainer(spatial_parallel=N) trains over a
    ('data', 'spatial') mesh: the production wiring of parallel/spatial.py."""
    from cbench_basic_tpu.codecs.neural import NeuralImageCodec
    from cbench_basic_tpu.data import SyntheticImageDataset
    from cbench_basic_tpu.data.datasets import BatchedPatchLoader
    from cbench_basic_tpu.nn.models.hyperprior import MeanScaleHyperprior
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    model = MeanScaleHyperprior(N=16, M=24)
    codec = NeuralImageCodec(model, lmbda=0.01)
    ds = SyntheticImageDataset(num_items=4, height=96, width=96)
    loader = BatchedPatchLoader(ds, batch_size=2, patch_size=64,
                                steps_per_epoch=4)
    trainer = NeuralCodecTrainer(dataloader=loader, num_epochs=1,
                                 log_every=2, data_parallel=True,
                                 spatial_parallel=4)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x0 = jnp.asarray(next(iter(loader)))
    loss_before, _ = codec.loss_fn(codec.params, x0, jax.random.PRNGKey(9))
    trainer.train_module(codec)
    loss_after, _ = codec.loss_fn(codec.params, x0, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss_after))
    assert float(loss_after) < float(loss_before)


def test_pipeline_train_step_learns(cpu8):
    n_stages, dim = 2, 6
    mesh = make_pipeline_mesh(n_stages, cpu8)
    stages = _make_stages(jax.random.PRNGKey(4), n_stages, dim)
    stacked = stack_stage_params(stages)
    tx = optax.adam(5e-2)
    opt_state = tx.init(stacked)

    mbs = jax.random.normal(jax.random.PRNGKey(5), (3, 4, dim))
    targets = jnp.zeros_like(mbs)

    def loss_fn(outs, tgt):
        return jnp.mean((outs - tgt) ** 2)

    step = make_pipeline_train_step(_stage_apply, loss_fn, tx, mesh)
    losses = []
    for _ in range(5):
        stacked, opt_state, loss = step(stacked, opt_state, mbs, targets)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # grads flowed back through the ring
