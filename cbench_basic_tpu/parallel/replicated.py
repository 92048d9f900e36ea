"""Model-list (per-λ replica) parallelism over a device mesh.

Parity target: CUDADeviceParallelNNTrainer (reference cbench/nn/trainer.py:
663-754) — N independent per-λ codec replicas round-robined onto CUDA
devices, one forward per device per step.

TPU-first re-architecture: instead of host-side device round-robining, the
replicas' parameter pytrees are STACKED on a leading replica axis, the whole
(loss, grad, optimizer-update) step is jax.vmap'ed over that axis, and the
stacked arrays are sharded over a 'replica' mesh axis (batch over a 'data'
axis) — XLA partitions the vmapped program so every replica trains
concurrently in ONE jitted dispatch, with gradient clipping and Adam state
kept per-replica by construction.

The per-λ rate weight enters as a TRACED per-replica scalar through the
LossyDummyCoder lmbda override (graph/node_coders.py), so one compiled
program serves all replicas.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.latent_graph import rd_loss
from ..train.trainer import make_rd_optimizer
from ..utils.engine import BaseEngine


def stack_params(params_list: Sequence[Any]):
    """Stack structurally-identical parameter pytrees on a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_params(stacked, num_replicas: int) -> List[Any]:
    return [jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
            for i in range(num_replicas)]


def make_replica_mesh(num_replicas: int,
                      devices: Optional[Sequence] = None) -> Mesh:
    """2D (replica, data) mesh. With fewer devices than replicas the replica
    axis stays unsharded-compatible (axis size 1) and XLA serializes."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    r = num_replicas if n % num_replicas == 0 else 1
    d = n // r
    return Mesh(np.array(devices[: r * d]).reshape(r, d),
                axis_names=("replica", "data"))


class ReplicaParallelTrainer(BaseEngine):
    """Trains a list of per-λ LatentGraphCodec replicas concurrently."""

    def __init__(self, dataloader=None, num_epochs: int = 1,
                 learning_rate=1e-4, aux_learning_rate: float = 1e-3,
                 grad_clip: float = 1.0, seed: int = 0, log_every: int = 50,
                 mesh: Optional[Mesh] = None, **kwargs):
        super().__init__(**kwargs)
        self.dataloader = dataloader
        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.aux_learning_rate = aux_learning_rate
        self.grad_clip = grad_clip
        self.seed = seed
        self.log_every = log_every
        self.mesh = mesh

    @staticmethod
    def _codec_lmbda(codec) -> float:
        x_node = codec.model.generative_order[-1]
        coder = codec.model.node_coders[x_node]
        return float(getattr(coder, "lmbda", getattr(codec, "lmbda", 0.01)))

    def build_train_step(self, model, x_node: str, num_pixels: int):
        tx = make_rd_optimizer(self.learning_rate, self.aux_learning_rate,
                               self.grad_clip)

        def replica_loss(p, lam, batch, rng):
            out = model.apply({"params": p}, batch, training=True, rng=rng,
                              node_kwargs={x_node: {"lmbda": lam}})
            loss, metrics = rd_loss(out, num_pixels)
            aux = model.apply({"params": p}, method=lambda m: m.aux_loss())
            metrics["aux_loss"] = aux
            return loss + aux, metrics

        def replica_step(p, o, lam, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(
                replica_loss, has_aux=True)(p, lam, batch, rng)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, metrics

        # One program, all replicas: vmap over the stacked axis; batch and
        # its 'data' sharding are shared (in_axes=None).
        step = jax.vmap(replica_step, in_axes=(0, 0, 0, None, 0))
        return tx, step

    def train_group(self, codecs: Sequence, lmbdas: Optional[Sequence[float]] = None
                    ) -> Dict[str, Any]:
        """One jitted step trains every replica; params written back per codec."""
        base = codecs[0]
        model = base.model
        x_node = model.generative_order[-1]
        R = len(codecs)
        if lmbdas is None:
            lmbdas = [self._codec_lmbda(c) for c in codecs]
        lmbdas = jnp.asarray(lmbdas, jnp.float32)

        rng = jax.random.PRNGKey(self.seed)
        for i, c in enumerate(codecs):
            if c.params is None:
                rng, init_rng = jax.random.split(rng)
                sample = next(iter(self.dataloader))
                c.init_params(init_rng, input_shape=(1,) + sample.shape[1:])
        stacked = stack_params([c.params for c in codecs])

        sample = next(iter(self.dataloader))
        num_pixels = int(sample.shape[0] * sample.shape[1] * sample.shape[2])
        tx, vstep = self.build_train_step(model, x_node, num_pixels)
        opt_state = jax.vmap(tx.init)(stacked)

        mesh = self.mesh if self.mesh is not None else make_replica_mesh(R)
        rep = NamedSharding(mesh, P("replica"))
        batch_sh = NamedSharding(mesh, P("data"))
        step_fn = jax.jit(vstep,
                          in_shardings=(rep, rep, rep, batch_sh, rep),
                          out_shardings=(rep, rep, rep))
        stacked = jax.device_put(stacked, rep)
        opt_state = jax.device_put(opt_state, rep)
        lmbdas = jax.device_put(lmbdas, rep)

        step = 0
        last: Dict[str, Any] = {}
        for epoch in range(self.num_epochs):
            for batch in self.dataloader:
                batch = jax.device_put(jnp.asarray(batch), batch_sh)
                rng, sub = jax.random.split(rng)
                step_rngs = jax.device_put(jax.random.split(sub, R), rep)
                stacked, opt_state, metrics = step_fn(
                    stacked, opt_state, lmbdas, batch, step_rngs)
                step += 1
                if step % self.log_every == 0:
                    last = {k: np.asarray(v).tolist()
                            for k, v in metrics.items()}
                    self.logger.info(f"replica step {step}: " + " ".join(
                        f"{k}={v}" for k, v in last.items()))
        last = {k: np.asarray(v).tolist() for k, v in metrics.items()}

        for c, p in zip(codecs, unstack_params(jax.device_get(stacked), R)):
            c.params = p
            if hasattr(c, "invalidate_coders"):
                c.invalidate_coders()
        return last
