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


def _make_opt(kind: str, lr, momentum: float = 0.9, beta1: float = 0.9):
    if kind == "adam":
        return optax.adam(lr, b1=beta1)
    if kind == "adabelief":
        return optax.adabelief(lr, b1=beta1)
    if kind == "sgd":
        return optax.sgd(lr, momentum=momentum)
    raise ValueError(f"unknown optimizer {kind!r}")


def make_rd_optimizer(learning_rate=1e-4, aux_learning_rate=1e-3,
                      grad_clip: float = 1.0, optimizer: str = "adam",
                      aux_optimizer: Optional[str] = None,
                      momentum: float = 0.9,
                      beta1: float = 0.9) -> optax.GradientTransformation:
    """Main optimizer on model params + aux optimizer on entropy-bottleneck
    quantiles.

    Parity: make_optimizer aux_id routing with SGD/Adam/AdaBelief families
    (nn/trainer.py:55-135) and the model_wrapper_configs surface
    (compressai_model = Adam 1e-4 + aux Adam 1e-3 clip 1.0; emvb_adabelief,
    sgd variants — configs/trainer/model_wrapper_configs/).
    learning_rate / aux_learning_rate may be floats or optax schedules
    (step -> lr), wiring train/schedulers.py into the loop.
    """
    def label_fn(params):
        def walk(tree, path=()):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return "aux" if any("quantiles" in p for p in path) else "main"
        return walk(params)

    main = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        _make_opt(optimizer, learning_rate, momentum, beta1),
    )
    aux = _make_opt(aux_optimizer or optimizer, aux_learning_rate, momentum,
                    beta1)
    return optax.multi_transform({"main": main, "aux": aux}, label_fn)


def make_data_mesh(num_devices: Optional[int] = None,
                   batch_size: Optional[int] = None) -> Mesh:
    """1D 'data' mesh. With batch_size given, uses the largest device count
    that divides the batch (a batch smaller than the device count must not
    fail — it just shards over fewer devices)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        devices = devices[:n]
    return Mesh(np.array(devices), axis_names=("data",))


class NeuralCodecTrainer(BaseEngine):
    """Trains a NeuralImageCodec's RD objective (+aux loss) with optax."""

    def __init__(self, dataloader=None, num_epochs: int = 1,
                 learning_rate: float = 1e-4, aux_learning_rate: float = 1e-3,
                 grad_clip: float = 1.0, optimizer: str = "adam",
                 aux_optimizer=None, momentum: float = 0.9,
                 beta1: float = 0.9, seed: int = 0,
                 log_every: int = 50, checkpoint_every_epochs: int = 1,
                 val_dataloader=None, data_parallel: bool = True,
                 spatial_parallel: int = 1,
                 val_every_epochs: int = 1, val_metric: str = "loss",
                 keep_best: bool = True, check_finite: bool = True,
                 lr_schedule=None, param_schedulers=(),
                 parallel_replicas: bool = False,
                 product_loss=None, lambda_adjuster=None,
                 tb_log: bool = False, tb_hist_every_epochs: int = 0,
                 scan_steps: int = 0, rate_level_lambdas=None,
                 epoch_callback=None,
                 **kwargs):
        """Training-loop parity knobs (reference LightningTrainer stack,
        nn/trainer.py:1203-1401):
          val_every_epochs/val_metric — periodic validation on
            val_dataloader (check_val_every_n_epoch + val_metric selection);
          keep_best — restore the best-val params at the end
            (ModelCheckpoint best extraction, :1346-1358);
          check_finite — stop on NaN/inf loss (EarlyStopping(check_finite));
          lr_schedule — optional step->lr schedule (train/schedulers.py);
          param_schedulers — ParamScheduler list annealing traced per-node
            scalars, name format "<node>.<kwarg>" (e.g. "y.temperature").
          spatial_parallel — shard the image HEIGHT over a 'spatial' mesh
            axis of this size alongside 'data' (parallel/spatial.py; XLA
            conv halo exchange). Batch H must divide by it x total stride.
          scan_steps — TPU-native fast path: when >1 and `dataloader` is a
            DevicePatchSampler (data/device_data.py), each dispatch runs
            this many train steps under one lax.scan with data sampled on
            device — removing the per-step host round trip that dominates
            small-batch training on network-attached TPUs. Width/level
            sampling then happens per CHUNK (one static level per scan);
            param_schedulers are evaluated at chunk granularity. Requires
            no product_loss and no mesh (falls back to the per-batch loop
            otherwise, with a warning).
          rate_level_lambdas — variable-rate (gain-vector) training: a list
            of R distortion weights, one per rate level of the codec's
            rate-carrying node (topogroup.py num_rate_levels gain vectors).
            Each step samples a level uniformly and trains at THAT level's
            gain with THAT level's λ — one parameter set serving R rate
            points (parity: AutoEncoderPriorModelBackboneV2's per-level
            gain/λ pairing, reference prior_model/autoencoder_v2.py).
            Ignored (with a warning) when the codec has no rate axis or
            when product_loss is set.
        """
        super().__init__(**kwargs)
        self.dataloader = dataloader
        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.aux_learning_rate = aux_learning_rate
        self.grad_clip = grad_clip
        self.optimizer = optimizer
        self.aux_optimizer = aux_optimizer
        self.momentum = momentum
        self.beta1 = beta1
        self.seed = seed
        self.log_every = log_every
        self.checkpoint_every_epochs = checkpoint_every_epochs
        self.val_dataloader = val_dataloader
        self.data_parallel = data_parallel
        self.spatial_parallel = spatial_parallel
        self.val_every_epochs = val_every_epochs
        self.val_metric = val_metric
        self.keep_best = keep_best
        self.check_finite = check_finite
        self.lr_schedule = lr_schedule
        self.param_schedulers = tuple(param_schedulers)
        self.parallel_replicas = parallel_replicas
        # Dynamic-node product training (train/dynamic_axes.py): a
        # ProductLoss replaces the single-combination loss — per-step
        # sampled sc×vr combinations with sandwich endpoints and optional
        # relative-FLOPs normalization (reference latent_graph.py:898-1078);
        # a LambdaFlopsAdjuster auto-adjusts the FLOPs penalty / rejects
        # overshooting steps (reference :1136-1166).
        self.product_loss = product_loss
        self.lambda_adjuster = lambda_adjuster
        # TensorBoard cache logging (utils/tb_logging.py — parity: the
        # reference's TB scalar/hist/image cache flushes, nn/trainer.py).
        self.tb_log = tb_log
        self.tb_hist_every_epochs = tb_hist_every_epochs
        self.scan_steps = int(scan_steps)
        self.rate_level_lambdas = (tuple(float(v) for v in rate_level_lambdas)
                                   if rate_level_lambdas else None)
        # Optional (epoch, step, params) -> None hook, called after each
        # epoch's checkpoint — e.g. a held-out bitstream eval during long
        # schedules (tools/train_flagship.py --eval-every).
        self.epoch_callback = epoch_callback

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

    def save_params(self, codec_or_params):
        """Persist final params.pkl. When given a codec, searched state
        (complexity_levels — the analog of the reference's
        _complexity_param_all_levels buffers living inside state_dict,
        latent_graph.py:619-621) is stored alongside the parameters so a
        restart does not lose the post-training search."""
        if self.output_dir is None:
            return
        payload = codec_or_params
        if hasattr(codec_or_params, "params"):
            codec = codec_or_params
            payload = {"params": jax.device_get(codec.params)}
            if getattr(codec, "complexity_levels", None) is not None:
                payload["complexity_levels"] = codec.complexity_levels
        else:
            payload = jax.device_get(payload)
        with locked_file(self.output_path("params.pkl"), "wb") as f:
            pickle.dump(payload, f)

    def load_params(self, codec) -> bool:
        """Restore params.pkl (params + searched complexity levels) onto a
        codec. Returns True when a checkpoint was found."""
        if self.output_dir is None:
            return False
        path = self.output_path("params.pkl")
        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict) and "params" in payload:
            codec.params = payload["params"]
            if payload.get("complexity_levels") is not None:
                codec.complexity_levels = payload["complexity_levels"]
                codec._complex_level = len(codec.complexity_levels) - 1
        else:  # legacy raw-params pickle
            codec.params = payload
        if hasattr(codec, "invalidate_coders"):
            codec.invalidate_coders()
        return True

    # -- training ------------------------------------------------------------
    def train_module(self, codec) -> Dict[str, Any]:
        # Grouped (per-λ) codecs: train each member into its own subdir.
        # Parity: GroupedCodecBenchmarkBuilder looping per-λ codec builds
        # (group_benchmark_builder.py:55-124). With parallel_replicas, all
        # replicas train concurrently in one jitted step over a 'replica'
        # mesh axis (parallel/replicated.py — the model-list parallelism of
        # CUDADeviceParallelNNTrainer, nn/trainer.py:663-754).
        if hasattr(codec, "codecs") and not hasattr(codec, "loss_fn"):
            if self.parallel_replicas:
                try:
                    return self._train_group_parallel(codec)
                except Exception as e:  # structure mismatch etc.
                    self.logger.warning(
                        f"parallel replica training unavailable ({e}); "
                        f"falling back to sequential")
            metrics = {}
            for i, sub in enumerate(codec.codecs):
                sub_dir = (os.path.join(self.output_dir, f"codec_{i}")
                           if self.output_dir else None)
                sub_trainer = self.setup_engine_from_copy(output_dir=sub_dir)
                metrics[f"codec_{i}"] = sub_trainer.train_module(sub)
            return metrics
        return self._train_single(codec)

    def _train_group_parallel(self, codec) -> Dict[str, Any]:
        from ..parallel.replicated import ReplicaParallelTrainer

        rp = ReplicaParallelTrainer(
            dataloader=self.dataloader, num_epochs=self.num_epochs,
            learning_rate=(self.lr_schedule or self.learning_rate),
            aux_learning_rate=self.aux_learning_rate,
            grad_clip=self.grad_clip, seed=self.seed,
            log_every=self.log_every, output_dir=self.output_dir,
            logger=self.logger)
        metrics = rp.train_group(list(codec.codecs))
        for i, sub in enumerate(codec.codecs):
            sub_dir = (os.path.join(self.output_dir, f"codec_{i}")
                       if self.output_dir else None)
            if sub_dir is not None:
                self.setup_engine_from_copy(output_dir=sub_dir).save_params(sub)
        return {"parallel_replicas": metrics}

    def _sched_node_kwargs(self, step: int):
        """ParamScheduler values for this step as traced per-node kwargs
        ({"y": {"temperature": f32}}); None when no schedulers configured."""
        if not self.param_schedulers:
            return None
        out: Dict[str, Dict[str, jnp.ndarray]] = {}
        for ps in self.param_schedulers:
            node, _, key = ps.name.partition(".")
            out.setdefault(node, {})[key] = jnp.float32(ps.value(step))
        return out

    _adjuster_scale = 1.0

    def _observe_adjuster(self, product, combos, metrics, batch):
        """Feed the sampled combo's FLOPs-per-dim into the λC adjuster and
        stash the next step's update scale (rejection method)."""
        if self.lambda_adjuster is None or product.sc_axis is None:
            return
        from .dynamic_axes import combo_prefix
        mid = dict(combos[1] if len(combos) > 2 else combos[0])
        key = combo_prefix(mid) + "flops"
        if key not in metrics:
            return
        numel = float(np.prod(np.asarray(batch).shape[1:]))
        fpd = float(metrics[key]) / max(numel, 1.0)
        _, scale = self.lambda_adjuster.observe(
            fpd, mid[product.sc_axis.name])
        self._adjuster_scale = scale

    _val_step = None

    def _validate(self, codec, params) -> Dict[str, float]:
        """Eval-mode loss over the validation set: ONE jitted step reused for
        every batch, metrics accumulated on device, a single host transfer at
        the end (the round-2 version dispatched eagerly and synced per batch
        — the dominant cost of the 2000-epoch parity schedule's periodic
        vals)."""
        if self.val_dataloader is None or not hasattr(codec, "eval_loss_fn"):
            return {}
        if self._val_step is None:
            self._val_step = jax.jit(
                lambda p, b: codec.eval_loss_fn(p, b)[1])
        totals = None
        n = 0
        for batch in self.val_dataloader:
            m = self._val_step(params, jnp.asarray(batch))
            m = {k: v for k, v in m.items() if getattr(v, "ndim", 1) == 0}
            totals = m if totals is None else jax.tree_util.tree_map(
                lambda a, b: a + b, totals, m)
            n += 1
        if not totals:
            return {}
        host = jax.device_get(totals)
        return {f"val_{k}": float(v) / max(n, 1) for k, v in host.items()}

    def _train_single(self, codec) -> Dict[str, Any]:
        rng = jax.random.PRNGKey(self.seed)
        if codec.params is None:
            rng, init_rng = jax.random.split(rng)
            sample = next(iter(self.dataloader))
            codec.init_params(init_rng, input_shape=(1,) + sample.shape[1:])

        lr = self.lr_schedule if self.lr_schedule is not None else self.learning_rate
        tx = make_rd_optimizer(lr, self.aux_learning_rate, self.grad_clip,
                               optimizer=self.optimizer,
                               aux_optimizer=self.aux_optimizer,
                               momentum=self.momentum, beta1=self.beta1)
        params = codec.params
        opt_state = tx.init(params)
        start_epoch = 0
        best_val = float("inf")
        best_epoch = -1

        ckpt = self.load_checkpoint()
        if ckpt is not None:
            params = ckpt["params"]
            opt_state = ckpt["opt_state"]
            start_epoch = ckpt["epoch"] + 1
            best_val = ckpt.get("best_val", best_val)
            best_epoch = ckpt.get("best_epoch", best_epoch)
            rng = jax.random.wrap_key_data(ckpt["rng"]) if isinstance(
                ckpt["rng"], (np.ndarray, jnp.ndarray)) else rng
            self.logger.info(f"resumed from epoch {start_epoch}")

        if self.data_parallel:
            first = next(iter(self.dataloader))
            bs = int(np.asarray(first).shape[0])
            if self.spatial_parallel > 1:
                from ..parallel.spatial import make_spatial_mesh
                n_sp = self.spatial_parallel
                avail = max(1, len(jax.devices()) // n_sp)
                n_dp = next(d for d in range(min(bs, avail), 0, -1)
                            if bs % d == 0)
                mesh = make_spatial_mesh(n_dp, n_sp)
            else:
                mesh = make_data_mesh(batch_size=bs)
        else:
            mesh = None

        # Sampled-width ("sandwich") training: each step trains either the
        # soft pgm mixture or one hard width level, uniformly sampled —
        # without this, widths the mixture rarely visits degrade at hard
        # (coding-time) evaluation. Parity: per-step dynamic-node sampling.
        level_choices = (codec.training_level_choices()
                         if hasattr(codec, "training_level_choices") else [None])
        level_rng = np.random.default_rng(self.seed + 1)
        supports_levels = hasattr(codec, "training_level_choices")
        supports_nk = self.param_schedulers and supports_levels

        product = self.product_loss

        # Variable-rate (gain-vector) training: resolve the rate-carrying
        # node (num_rate_levels > 1) and the distortion node once; each
        # step then samples a traced level + its λ inside total_loss.
        rate_nodes, rl_lambdas = None, None
        if self.rate_level_lambdas is not None:
            model = getattr(codec, "model", None)
            y_node = None
            if model is not None and product is None:
                y_node = next(
                    (n for n, c in model.node_coders.items()
                     if getattr(c, "num_rate_levels", 1) > 1), None)
            if y_node is None:
                self.logger.warning(
                    "rate_level_lambdas needs a codec with a gain-vector "
                    "rate axis and no product_loss; ignoring")
            elif not supports_levels:
                # Without node_kwargs support the sampled level/λ would be
                # silently dropped by total_loss's fixed-rate branch.
                self.logger.warning(
                    "rate_level_lambdas needs a codec with node_kwargs "
                    "support (training_level_choices); ignoring")
            else:
                n_lv = int(model.node_coders[y_node].num_rate_levels)
                if n_lv != len(self.rate_level_lambdas):
                    self.logger.warning(
                        f"rate_level_lambdas has {len(self.rate_level_lambdas)}"
                        f" entries but the codec has {n_lv} rate levels")
                rate_nodes = (y_node, model.generative_order[-1])
                rl_lambdas = jnp.asarray(self.rate_level_lambdas, jnp.float32)

        def _merge_nk(a, b):
            if not a:
                return b
            if not b:
                return a
            out = {k: dict(v) for k, v in a.items()}
            for node, kw in b.items():
                out.setdefault(node, {}).update(kw)
            return out

        def total_loss(p, batch, step_rng, static_arg=None, traced=None):
            rate_nk = None
            if rate_nodes is not None:
                step_rng, k_lv = jax.random.split(step_rng)
                lv = jax.random.randint(k_lv, (), 0, rl_lambdas.shape[0])
                rate_nk = {rate_nodes[0]: {"vrlevel": lv},
                           rate_nodes[1]: {"lmbda": rl_lambdas[lv]}}
            if product is not None:
                # traced = (flops_mult, update_scale, sched_node_kwargs):
                # param_schedulers apply in product mode too (per-combo
                # kwargs override the scheduled defaults per key).
                flops_mult = traced[0] if traced is not None else None
                sched_nk = traced[2] if (traced is not None
                                         and len(traced) > 2) else None
                loss, metrics = product(p, batch, step_rng, static_arg,
                                        flops_loss_mult=flops_mult,
                                        node_kwargs=sched_nk)
            elif supports_nk or (rate_nk is not None and supports_levels):
                nk = _merge_nk(traced if supports_nk else None, rate_nk)
                loss, metrics = codec.loss_fn(p, batch, step_rng,
                                              edge_levels=static_arg,
                                              node_kwargs=nk)
            elif supports_levels:
                loss, metrics = codec.loss_fn(p, batch, step_rng,
                                              edge_levels=static_arg)
            else:
                loss, metrics = codec.loss_fn(p, batch, step_rng)
            aux = codec.model.apply({"params": p}, method=lambda m: m.aux_loss())
            metrics["aux_loss"] = aux
            return loss + aux, metrics

        check_finite = self.check_finite

        def train_step(p, o, bad, batch, step_rng, static_arg=None,
                       traced=None):
            (loss, metrics), grads = jax.value_and_grad(
                total_loss, has_aux=True)(p, batch, step_rng, static_arg,
                                          traced)
            if product is not None and traced is not None:
                # λC rejection: a traced 0/1 zeroes the gradients so a
                # rejected step leaves the parameters (and Adam's first
                # moments, up to decay) unchanged without recompiling.
                scale = traced[1]
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, o_new = tx.update(grads, o, p)
            p_new = optax.apply_updates(p, updates)
            if check_finite:
                # Traced per-step finite guard: a non-finite loss skips the
                # whole update (params AND optimizer state unchanged), and a
                # device-side counter threads through the loop so the host
                # learns about NaNs at un-logged steps without any extra
                # sync. Parity: EarlyStopping(check_finite) — but the
                # reference can checkpoint post-NaN params between its
                # checks; here poisoned updates can never land.
                good = jnp.isfinite(loss)
                p = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(good, a, b), p_new, p)
                o = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(good, a, b), o_new, o)
                bad = bad + (1 - good.astype(jnp.int32))
            else:
                p, o = p_new, o_new
            return p, o, bad, metrics

        train_step_core = train_step  # un-jitted: reused by the scan path
        bad_count = jnp.int32(0)
        if mesh is not None:
            replicated = NamedSharding(mesh, P())
            batch_sharding = NamedSharding(
                mesh, P("data", "spatial", None, None)
                if "spatial" in mesh.axis_names else P("data"))
            # pjit forbids kwargs with in_shardings: edge_levels passes
            # positionally (UNSPECIFIED sharding slot is not allowed for a
            # static arg, so it is excluded from in_shardings).
            train_step = jax.jit(
                train_step,
                in_shardings=(replicated, replicated, replicated,
                              batch_sharding, replicated, replicated),
                out_shardings=(replicated, replicated, replicated,
                               replicated),
                static_argnums=(5,))
            params = jax.device_put(params, replicated)
            opt_state = jax.device_put(opt_state, replicated)
            bad_count = jax.device_put(bad_count, replicated)
        else:
            train_step = jax.jit(train_step, static_argnums=(5,))
            batch_sharding = None

        # TPU-native scanned inner loop: K steps per dispatch, data sampled
        # on device (data/device_data.py). See the scan_steps docstring.
        scan_mode = (self.scan_steps > 1
                     and hasattr(self.dataloader, "sample")
                     and mesh is None and product is None)
        if self.scan_steps > 1 and not scan_mode:
            self.logger.warning(
                "scan_steps needs a device-sampler dataloader, no mesh and "
                "no product_loss; using the per-batch loop")
        if scan_mode:
            sampler = self.dataloader
            n_scan = self.scan_steps
            # The image bank rides as an ARGUMENT (not a closure constant):
            # closed-over device arrays are embedded into the HLO proto,
            # which both duplicates HBM and can exceed a remote-compile
            # service's request limit for large training sets (observed
            # HTTP 413 at ~600 MB of constants). See DevicePatchSampler.bank.
            sampler_bank = (sampler.bank if hasattr(sampler, "bank")
                            else None)

            def scan_chunk(p, o, bad, chunk_rng, bank, static_arg=None,
                           traced=None):
                def body(carry, _):
                    p, o, bad, r = carry
                    r, k_data, k_step = jax.random.split(r, 3)
                    batch = (sampler.sample_from(bank, k_data)
                             if bank is not None else sampler.sample(k_data))
                    p, o, bad, m = train_step_core(
                        p, o, bad, batch, k_step, static_arg, traced)
                    return (p, o, bad, r), m

                (p, o, bad, chunk_rng), ms = jax.lax.scan(
                    body, (p, o, bad, chunk_rng), None, length=n_scan)
                return p, o, bad, chunk_rng, jax.tree_util.tree_map(
                    lambda a: jnp.mean(a, axis=0), ms)

            scan_chunk = jax.jit(scan_chunk, static_argnums=(5,))

        tb = None
        if self.tb_log and self.output_dir is not None:
            from ..utils.tb_logging import TrainingLogWriter
            tb = TrainingLogWriter(os.path.join(self.output_dir, "tb"))

        step = 0
        last_metrics: Dict[str, float] = {}
        stop_reason = None
        for epoch in range(start_epoch, self.num_epochs):
            t0 = time.time()
            if scan_mode:
                n_outer = max(1, getattr(sampler, "steps_per_epoch", n_scan)
                              // n_scan)
                for _ in range(n_outer):
                    choice = level_choices[
                        int(level_rng.integers(len(level_choices)))]
                    params, opt_state, bad_count, rng, metrics = scan_chunk(
                        params, opt_state, bad_count, rng, sampler_bank,
                        choice, self._sched_node_kwargs(step))
                    prev, step = step, step + n_scan
                    if prev // self.log_every != step // self.log_every:
                        last_metrics = {
                            k: float(v) for k, v in metrics.items()}
                        if tb is not None:
                            tb.add_scalars(last_metrics, step)
                        self.logger.info(
                            f"epoch {epoch} step {step}: " +
                            " ".join(f"{k}={v:.4f}"
                                     for k, v in last_metrics.items()))
                        if self.check_finite and (
                                int(bad_count) > 0
                                or not np.isfinite(
                                    last_metrics.get("loss", 0.0))):
                            stop_reason = "non_finite_loss"
                            break
            for batch in ([] if scan_mode else self.dataloader):
                batch = jnp.asarray(batch)
                if batch_sharding is not None:
                    batch = jax.device_put(batch, batch_sharding)
                rng, step_rng = jax.random.split(rng)
                if product is not None:
                    combos = product.step_combos(level_rng, training=True)
                    mult, scale = 1.0, 1.0
                    if self.lambda_adjuster is not None and step > 0:
                        mult = getattr(self.lambda_adjuster, "mult", 1.0)
                        scale = self._adjuster_scale
                    params, opt_state, bad_count, metrics = train_step(
                        params, opt_state, bad_count, batch, step_rng, combos,
                        (jnp.float32(mult), jnp.float32(scale),
                         self._sched_node_kwargs(step)))
                    self._observe_adjuster(product, combos, metrics, batch)
                else:
                    choice = level_choices[int(level_rng.integers(len(level_choices)))]
                    params, opt_state, bad_count, metrics = train_step(
                        params, opt_state, bad_count, batch, step_rng, choice,
                        self._sched_node_kwargs(step))
                step += 1
                if step % self.log_every == 0:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    if tb is not None:
                        tb.add_scalars(last_metrics, step)
                    self.logger.info(
                        f"epoch {epoch} step {step}: " +
                        " ".join(f"{k}={v:.4f}" for k, v in last_metrics.items()))
                    # The device-side counter catches NaNs at UN-logged steps
                    # too (their updates were skipped on device).
                    if self.check_finite and (
                            int(bad_count) > 0
                            or not np.isfinite(last_metrics.get("loss", 0.0))):
                        stop_reason = "non_finite_loss"
                        break
            last_metrics = {k: float(v) for k, v in metrics.items()}
            if self.check_finite and (
                    int(bad_count) > 0
                    or not np.isfinite(last_metrics.get("loss", 0.0))):
                stop_reason = stop_reason or "non_finite_loss"
            self.logger.info(
                f"epoch {epoch} done in {time.time()-t0:.1f}s: " +
                " ".join(f"{k}={v:.4f}" for k, v in last_metrics.items()))
            if stop_reason:
                self.logger.error(f"stopping training: {stop_reason} "
                                  f"(parity: EarlyStopping(check_finite))")
                break

            # Periodic validation + best-checkpoint (parity: val every
            # check_val_every_n_epoch + ModelCheckpoint best extraction).
            if (self.val_dataloader is not None
                    and (epoch + 1) % self.val_every_epochs == 0):
                val_metrics = self._validate(codec, params)
                if val_metrics:
                    last_metrics.update(val_metrics)
                    if tb is not None:
                        tb.add_scalars(val_metrics, step)
                    self.logger.info(
                        f"epoch {epoch} validation: " +
                        " ".join(f"{k}={v:.4f}" for k, v in val_metrics.items()))
                    cur = val_metrics.get(f"val_{self.val_metric}")
                    if cur is not None and cur < best_val:
                        best_val, best_epoch = cur, epoch
                        if self.output_dir is not None:
                            with locked_file(self.output_path("best_params.pkl"),
                                             "wb") as f:
                                pickle.dump(jax.device_get(params), f)
                        self.logger.info(
                            f"new best val_{self.val_metric}={cur:.4f}")

            if (tb is not None and self.tb_hist_every_epochs
                    and (epoch + 1) % self.tb_hist_every_epochs == 0):
                tb.add_param_histograms(params, step)
                tb.flush()

            if (epoch + 1) % self.checkpoint_every_epochs == 0:
                self.save_checkpoint({
                    "params": params, "opt_state": opt_state, "epoch": epoch,
                    "rng": jax.random.key_data(rng),
                    "best_val": best_val, "best_epoch": best_epoch})

            if self.epoch_callback is not None:
                self.epoch_callback(epoch, step, params)

        if tb is not None:
            tb.close()
        codec.params = jax.device_get(params)
        # Restore the best-validation weights as the exported params.
        if (self.keep_best and best_epoch >= 0 and self.output_dir is not None
                and os.path.exists(self.output_path("best_params.pkl"))):
            with open(self.output_path("best_params.pkl"), "rb") as f:
                codec.params = pickle.load(f)
            last_metrics["best_epoch"] = best_epoch
            last_metrics[f"best_val_{self.val_metric}"] = best_val
            self.logger.info(f"restored best params from epoch {best_epoch}")
        if stop_reason:
            last_metrics["stop_reason"] = stop_reason
        self.save_params(codec)
        if hasattr(codec, "invalidate_coders"):
            codec.invalidate_coders()
        return last_metrics
