"""Multi-step multi-chip numerical equivalence (VERDICT r3 #6).

The test that actually catches sharding-induced numerics bugs: train the
SAME codec from the SAME init with the SAME seed for K >= 10 steps with
and without device-mesh sharding, and require the loss trajectory and the
final parameters to agree to fp32-reduction tolerance. Covers:

  * dp=8 vs dp=1 through the production NeuralCodecTrainer
    (parity contract: the reference's Lightning DDP strategy,
    configs/trainer/trainer_configs/pl_gpu.py:6-11 — total-batch gradient
    equality across workers);
  * spatial sharding (trainer spatial_parallel) vs unsharded;
  * stacked per-λ replicas on a (replica, data) mesh vs the same
    vmapped step with no mesh (model-list parallelism).

Runs on the virtual 8-CPU-device mesh (conftest forces
xla_force_host_platform_device_count=8).
"""
import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph.builders import build_topogroup_hyperprior_graph
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

K_STEPS = 12  # 3 epochs x 4 batches


def _build_codec():
    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=8, lmbda=0.01, pattern="checkerboard", context_channels=16,
        y_stride=8)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    return codec


def _batches():
    rng = np.random.default_rng(7)
    return [rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
            for _ in range(4)]


def _probe():
    return jnp.asarray(
        np.random.default_rng(11).uniform(0, 1, (2, 32, 32, 3)), jnp.float32)


def _run(data_parallel: bool, spatial_parallel: int = 0):
    codec = _build_codec()
    probe = _probe()
    traj = []

    def record(epoch, step, params):
        loss, _ = codec.loss_fn(params, probe, jax.random.PRNGKey(99))
        traj.append(float(loss))

    trainer = NeuralCodecTrainer(
        dataloader=_batches(), num_epochs=3, seed=0,
        data_parallel=data_parallel, spatial_parallel=spatial_parallel,
        log_every=1000, check_finite=False, epoch_callback=record)
    trainer.train_module(codec)
    return codec.params, traj


def _max_param_diff(pa, pb):
    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(pb)
    return max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(la, lb))


def test_dp8_matches_dp1_trajectory_and_params():
    p1, t1 = _run(data_parallel=False)
    assert len(jax.devices()) >= 8, "test needs the virtual 8-device mesh"
    p8, t8 = _run(data_parallel=True)
    assert len(t1) == len(t8) == 3
    np.testing.assert_allclose(t1, t8, rtol=1e-4, atol=1e-5)
    assert _max_param_diff(p1, p8) < 5e-4, (t1, t8)


def test_spatial_sharding_matches_unsharded():
    p1, t1 = _run(data_parallel=False)
    psp, tsp = _run(data_parallel=True, spatial_parallel=2)
    np.testing.assert_allclose(t1, tsp, rtol=5e-4, atol=5e-5)
    # halo-exchange convs reassociate fp32 sums; Adam's sqrt(v) scaling
    # amplifies the reduction-order noise into ~1e-3 param drift over 12
    # steps (measured 1.0e-3) while the loss trajectory agrees to 1e-5.
    assert _max_param_diff(p1, psp) < 3e-3, (t1, tsp)


def test_replica_mesh_matches_unsharded_vmap():
    """Model-list parallelism: K steps of the stacked-replica train step on
    a (replica, data) mesh == the same step with no sharding applied."""
    from cbench_basic_tpu.parallel.replicated import (
        ReplicaParallelTrainer, make_replica_mesh, stack_params)
    from jax.sharding import NamedSharding, PartitionSpec as P

    codecs = []
    for i in range(2):
        model, specs = build_topogroup_hyperprior_graph(
            N=8, M=8, lmbda=0.01, pattern="checkerboard",
            context_channels=16, y_stride=8)
        c = LatentGraphCodec(model, specs)
        c.init_params(jax.random.PRNGKey(3), input_shape=(1, 32, 32, 3))
        codecs.append(c)
    lmbdas = [0.005, 0.02]

    trainer = ReplicaParallelTrainer(num_epochs=1)
    tx, step_fn = trainer.build_train_step(
        codecs[0].model, "x", num_pixels=32 * 32)
    step_fn = jax.jit(step_fn)

    batches = _batches()
    stacked0 = stack_params([c.params for c in codecs])
    lam = jnp.asarray(lmbdas, jnp.float32)

    def run(mesh):
        params = jax.tree_util.tree_map(jnp.array, stacked0)
        opt = jax.vmap(tx.init)(params)
        if mesh is not None:
            rep = NamedSharding(mesh, P("replica"))
            params = jax.device_put(params, rep)
            opt = jax.device_put(opt, rep)
        rng = jax.random.PRNGKey(5)
        for b in batches * 3:
            rng, sub = jax.random.split(rng)
            step_rngs = jax.random.split(sub, 2)
            batch = jnp.asarray(b)
            if mesh is not None:
                batch = jax.device_put(
                    batch, NamedSharding(mesh, P("data")))
            params, opt, metrics = step_fn(params, opt, lam, batch,
                                           step_rngs)
        return jax.device_get(params), float(jnp.mean(metrics["loss"]))

    mesh = make_replica_mesh(2)
    p_mesh, loss_mesh = run(mesh)
    p_plain, loss_plain = run(None)
    assert abs(loss_mesh - loss_plain) < 1e-4 * max(1.0, abs(loss_plain))
    # same fp32 reduction-order + Adam amplification budget as the
    # spatial check above (measured 1.7e-3 over 12 steps, loss equal)
    assert _max_param_diff(p_mesh, p_plain) < 3e-3
