"""Neural codec trainer: optax multi-optimizer, data-parallel mesh,
checkpoint/resume.

Parity targets: the reference's TorchGeneralTrainer/LightningTrainer stack
(cbench/nn/trainer.py:176-455, 1203-1401): main Adam + aux Adam routed by
parameter attribute (here: pytree path), global-norm grad clipping, periodic
validation, last/best checkpointing with file-locked writes, auto-resume.

TPU-first: one jitted train step over a jax.sharding.Mesh; the batch is
sharded over the 'data' axis, parameters replicated; gradients are averaged
by XLA collectives inserted automatically from the shardings (no NCCL-style
explicit comms).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.engine import BaseEngine, locked_file


def make_rd_optimizer(learning_rate: float = 1e-4, aux_learning_rate: float = 1e-3,
                      grad_clip: float = 1.0) -> optax.GradientTransformation:
    """Main Adam on model params + aux Adam on entropy-bottleneck quantiles.

    Parity: make_optimizer aux_id routing (nn/trainer.py:55-135) and
    compressai_model wrapper config (Adam 1e-4 + aux Adam 1e-3, clip 1.0).
    """
    def label_fn(params):
        def walk(tree, path=()):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return "aux" if any("quantiles" in p for p in path) else "main"
        return walk(params)

    main = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(learning_rate),
    )
    aux = optax.adam(aux_learning_rate)
    return optax.multi_transform({"main": main, "aux": aux}, label_fn)


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=("data",))


class NeuralCodecTrainer(BaseEngine):
    """Trains a NeuralImageCodec's RD objective (+aux loss) with optax."""

    def __init__(self, dataloader=None, num_epochs: int = 1,
                 learning_rate: float = 1e-4, aux_learning_rate: float = 1e-3,
                 grad_clip: float = 1.0, seed: int = 0,
                 log_every: int = 50, checkpoint_every_epochs: int = 1,
                 val_dataloader=None, data_parallel: bool = True,
                 **kwargs):
        super().__init__(**kwargs)
        self.dataloader = dataloader
        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.aux_learning_rate = aux_learning_rate
        self.grad_clip = grad_clip
        self.seed = seed
        self.log_every = log_every
        self.checkpoint_every_epochs = checkpoint_every_epochs
        self.val_dataloader = val_dataloader
        self.data_parallel = data_parallel

    # -- checkpointing -------------------------------------------------------
    def _ckpt_path(self):
        return self.output_path("last_ckpt.pkl") if self.output_dir else None

    def save_checkpoint(self, state: Dict[str, Any]):
        path = self._ckpt_path()
        if path is None:
            return
        host_state = jax.device_get(state)
        with locked_file(path, "wb") as f:
            pickle.dump(host_state, f)

    def load_checkpoint(self) -> Optional[Dict[str, Any]]:
        path = self._ckpt_path()
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        return None

    def save_params(self, params):
        if self.output_dir is None:
            return
        with locked_file(self.output_path("params.pkl"), "wb") as f:
            pickle.dump(jax.device_get(params), f)

    # -- training ------------------------------------------------------------
    def train_module(self, codec) -> Dict[str, Any]:
        # Grouped (per-λ) codecs: train each member into its own subdir.
        # Parity: GroupedCodecBenchmarkBuilder looping per-λ codec builds
        # (group_benchmark_builder.py:55-124).
        if hasattr(codec, "codecs") and not hasattr(codec, "loss_fn"):
            metrics = {}
            for i, sub in enumerate(codec.codecs):
                sub_dir = (os.path.join(self.output_dir, f"codec_{i}")
                           if self.output_dir else None)
                sub_trainer = self.setup_engine_from_copy(output_dir=sub_dir)
                metrics[f"codec_{i}"] = sub_trainer.train_module(sub)
            return metrics
        return self._train_single(codec)

    def _train_single(self, codec) -> Dict[str, Any]:
        rng = jax.random.PRNGKey(self.seed)
        if codec.params is None:
            rng, init_rng = jax.random.split(rng)
            sample = next(iter(self.dataloader))
            codec.init_params(init_rng, input_shape=(1,) + sample.shape[1:])

        tx = make_rd_optimizer(self.learning_rate, self.aux_learning_rate,
                               self.grad_clip)
        params = codec.params
        opt_state = tx.init(params)
        start_epoch = 0

        ckpt = self.load_checkpoint()
        if ckpt is not None:
            params = ckpt["params"]
            opt_state = ckpt["opt_state"]
            start_epoch = ckpt["epoch"] + 1
            rng = jax.random.wrap_key_data(ckpt["rng"]) if isinstance(
                ckpt["rng"], (np.ndarray, jnp.ndarray)) else rng
            self.logger.info(f"resumed from epoch {start_epoch}")

        mesh = make_data_mesh() if self.data_parallel else None

        # Sampled-width ("sandwich") training: each step trains either the
        # soft pgm mixture or one hard width level, uniformly sampled —
        # without this, widths the mixture rarely visits degrade at hard
        # (coding-time) evaluation. Parity: per-step dynamic-node sampling.
        level_choices = (codec.training_level_choices()
                         if hasattr(codec, "training_level_choices") else [None])
        level_rng = np.random.default_rng(self.seed + 1)

        def total_loss(p, batch, step_rng, edge_levels=None):
            loss, metrics = codec.loss_fn(p, batch, step_rng,
                                          edge_levels=edge_levels) \
                if hasattr(codec, "training_level_choices") else \
                codec.loss_fn(p, batch, step_rng)
            aux = codec.model.apply({"params": p}, method=lambda m: m.aux_loss())
            metrics["aux_loss"] = aux
            return loss + aux, metrics

        def train_step(p, o, batch, step_rng, edge_levels=None):
            (loss, metrics), grads = jax.value_and_grad(
                total_loss, has_aux=True)(p, batch, step_rng, edge_levels)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return p, o, metrics

        if mesh is not None:
            replicated = NamedSharding(mesh, P())
            batch_sharding = NamedSharding(mesh, P("data"))
            # pjit forbids kwargs with in_shardings: edge_levels passes
            # positionally (UNSPECIFIED sharding slot is not allowed for a
            # static arg, so it is excluded from in_shardings).
            train_step = jax.jit(
                train_step,
                in_shardings=(replicated, replicated, batch_sharding, replicated),
                out_shardings=(replicated, replicated, replicated),
                static_argnums=(4,))
            params = jax.device_put(params, replicated)
            opt_state = jax.device_put(opt_state, replicated)
        else:
            train_step = jax.jit(train_step, static_argnums=(4,))
            batch_sharding = None

        step = 0
        last_metrics: Dict[str, float] = {}
        for epoch in range(start_epoch, self.num_epochs):
            t0 = time.time()
            for batch in self.dataloader:
                batch = jnp.asarray(batch)
                if batch_sharding is not None:
                    batch = jax.device_put(batch, batch_sharding)
                rng, step_rng = jax.random.split(rng)
                choice = level_choices[int(level_rng.integers(len(level_choices)))]
                params, opt_state, metrics = train_step(
                    params, opt_state, batch, step_rng, choice)
                step += 1
                if step % self.log_every == 0:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    self.logger.info(
                        f"epoch {epoch} step {step}: " +
                        " ".join(f"{k}={v:.4f}" for k, v in last_metrics.items()))
            last_metrics = {k: float(v) for k, v in metrics.items()}
            self.logger.info(
                f"epoch {epoch} done in {time.time()-t0:.1f}s: " +
                " ".join(f"{k}={v:.4f}" for k, v in last_metrics.items()))
            if (epoch + 1) % self.checkpoint_every_epochs == 0:
                self.save_checkpoint({
                    "params": params, "opt_state": opt_state, "epoch": epoch,
                    "rng": jax.random.key_data(rng)})

        codec.params = jax.device_get(params)
        self.save_params(codec.params)
        if hasattr(codec, "invalidate_coders"):
            codec.invalidate_coders()
        return last_metrics
