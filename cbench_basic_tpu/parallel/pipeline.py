"""Pipeline parallelism (pp): GPipe-style microbatch schedule over a
'stage' mesh axis.

The reference framework has no pipeline axis (its parallel modes are DDP
and per-λ model lists, cbench/nn/trainer.py); this is the TPU-native
capability that fills the pp slot of the dp/tp/sp/ep/pp matrix: each
device holds ONE stage's parameters, microbatches flow through the
stages with `lax.ppermute` ring rotations inside a `lax.scan`, and the
whole schedule is one jitted SPMD program (shard_map). Because ppermute
is differentiable (reverse = opposite rotation), wrapping the pipeline
in `value_and_grad` yields pipelined BACKWARD flow too — a full
training step, not just inference.

Stages must be shape-homogeneous (state-in == state-out), the standard
GPipe setting; heterogeneous graphs pick dp/tp/sp instead.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pipeline_mesh(n_stages: int,
                       devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, got {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), axis_names=("stage",))


def stack_stage_params(params_list: Sequence[Any]):
    """Stack per-stage parameter pytrees on a leading 'stage' axis (the
    dim that shards over the mesh: one stage's params per device)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any,
                   microbatches: jnp.ndarray,
                   mesh: Mesh,
                   axis_name: str = "stage") -> jnp.ndarray:
    """Run M microbatches through S pipeline stages in M+S-1 ticks.

    stage_fn(params, x) -> y with y.shape == x.shape (homogeneous
    stages). ``stacked_params`` has a leading stage dim sharded over the
    mesh; ``microbatches`` is (M, ...) and replicated. Returns the (M,
    ...) outputs of the final stage (replicated via a masked psum).

    Schedule: at tick t, stage 0 ingests microbatch t (t < M), every
    stage applies its sub-network to its current buffer, and the ring
    `ppermute` hands each stage's activation to the next; stage S-1's
    result at tick t is microbatch t-(S-1)'s output.
    """
    S = mesh.shape[axis_name]
    M = microbatches.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def body(params, mbs):
        p = jax.tree_util.tree_map(lambda a: a[0], params)  # this stage's
        idx = jax.lax.axis_index(axis_name)
        buf = jnp.zeros_like(mbs[0])
        outs = jnp.zeros_like(mbs)

        def tick(carry, t):
            buf, outs = carry
            mb_t = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x = jnp.where(idx == 0, jnp.where(t < M, mb_t, buf), buf)
            y = stage_fn(p, x)
            # the LAST stage's tick-t result is microbatch t-(S-1)'s output
            ot = t - (S - 1)
            oc = jnp.clip(ot, 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, oc, 0, keepdims=False)
            take = (idx == S - 1) & (ot >= 0) & (ot < M)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, y, prev), oc, 0)
            buf = jax.lax.ppermute(y, axis_name, perm)
            return (buf, outs), None

        (buf, outs), _ = jax.lax.scan(tick, (buf, outs),
                                      jnp.arange(M + S - 1))
        # replicate the final-stage outputs to every stage device
        outs = jax.lax.psum(jnp.where(idx == S - 1, outs, 0), axis_name)
        return outs

    spec_p = jax.tree_util.tree_map(lambda _: P(axis_name), stacked_params)
    return shard_map(body, mesh=mesh, in_specs=(spec_p, P()),
                     out_specs=P(), check_vma=False)(
                         stacked_params, microbatches)


def make_pipeline_train_step(stage_fn: Callable, loss_fn: Callable,
                             tx, mesh: Mesh, axis_name: str = "stage"):
    """One jitted pp training step: pipeline forward, scalar
    ``loss_fn(outputs, targets)``, grads w.r.t. the stage-sharded stacked
    params (backward rides the reverse ppermutes), optax update."""
    import optax

    stage_spec = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    n_stages = mesh.shape[axis_name]

    def step(stacked, opt_state, mbs, targets):
        def total(p):
            outs = pipeline_apply(stage_fn, p, mbs, mesh, axis_name)
            return loss_fn(outs, targets)

        loss, grads = jax.value_and_grad(total)(stacked)
        updates, opt_state = tx.update(grads, opt_state, stacked)
        return optax.apply_updates(stacked, updates), opt_state, loss

    def _shardings(tree):
        # stage-sharded where the leaf carries the leading stage dim
        # (stacked params and their adam mu/nu mirrors); optimizer
        # scalars (step count) stay replicated.
        return jax.tree_util.tree_map(
            lambda a: stage_spec
            if getattr(a, "ndim", 0) >= 1 and a.shape[0] == n_stages
            else repl, tree)

    def jitted(stacked, opt_state, mbs, targets):
        return jax.jit(
            step,
            in_shardings=(_shardings(stacked), _shardings(opt_state),
                          repl, repl),
            out_shardings=(_shardings(stacked), _shardings(opt_state),
                           repl),
        )(stacked, opt_state, mbs, targets)

    return jitted
