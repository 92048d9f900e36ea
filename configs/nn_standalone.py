"""Standalone NN-model training experiments (no entropy coding).

Parity: the reference's configs/nn.py / nn_imagenet32.py — train a plain
generative model (VAE / VQ-VAE) with the benchmark machinery, reporting
reconstruction + ELBO metrics instead of compressed bytes.

Env knobs: CBENCH_NN_MODEL=vae|vqvae, CBENCH_SMALL=1, CBENCH_EPOCHS.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data import BatchedPatchLoader, SyntheticImageDataset
from cbench_basic_tpu.utils.engine import BaseEngine

_SMALL = os.environ.get("CBENCH_SMALL") == "1"
_EPOCHS = int(os.environ.get("CBENCH_EPOCHS", "2" if _SMALL else "20"))


class StandaloneNNExperiment(BaseEngine):
    """Train a VAE / VQ-VAE on image patches and report eval metrics —
    a benchmark-shaped wrapper (run_benchmark/collect_metrics) so
    tools/run_benchmark.py drives it like any codec experiment."""

    def __init__(self, model_name: str = "vae", beta: float = 1.0,
                 batch_size: int = 8, patch_size: int = 64,
                 steps_per_epoch: int = 20, num_epochs: int = _EPOCHS,
                 seed: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.model_name = model_name
        self.beta = beta
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.steps_per_epoch = steps_per_epoch
        self.num_epochs = num_epochs
        self.seed = seed
        self.metric_dict = {}

    def _build_model(self):
        from cbench_basic_tpu.nn.models import VAE, VQVAE
        if self.model_name == "vae":
            return VAE(latent_channels=8 if _SMALL else 64,
                       hidden=(8, 16) if _SMALL else (32, 64, 128))
        # "vqvae" or "vqvae-<quantizer>" (ema/gssoft/pyramid/multi — the
        # reference's vqvae/_selftrain_gssoft/_pvq/_sp prior-model sweep)
        quantizer = "ema"
        if "-" in self.model_name:
            quantizer = self.model_name.split("-", 1)[1]
        return VQVAE(hidden=16 if _SMALL else 128,
                     dim=16 if _SMALL else 64,
                     num_codes=32 if _SMALL else 512,
                     quantizer=quantizer)

    image_size = 128

    def run_benchmark(self, **kwargs):
        import optax

        model = self._build_model()
        rng = jax.random.PRNGKey(self.seed)
        ds = SyntheticImageDataset(num_items=8, height=self.image_size,
                                   width=self.image_size)
        loader = BatchedPatchLoader(ds, self.batch_size, self.patch_size,
                                    steps_per_epoch=self.steps_per_epoch)
        sample = next(iter(loader))
        is_vae = self.model_name == "vae"
        needs_rng = is_vae or self.model_name.endswith("gssoft")
        if needs_rng:
            variables = model.init(rng, jnp.asarray(sample), training=True,
                                   rng=rng)
        else:
            variables = model.init(rng, jnp.asarray(sample), training=False)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}

        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def vae_step(p, o, batch, step_rng):
            def loss_fn(p):
                out = model.apply({"params": p}, batch, training=True,
                                  rng=step_rng)
                rec = jnp.mean((out["x_hat"] - batch) ** 2)
                kl = jnp.mean(out["kl"]) / np.prod(batch.shape[1:])
                return rec + self.beta * kl, (rec, kl)
            (l, (rec, kl)), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l, rec, kl

        @jax.jit
        def vq_step(p, st, o, batch, step_rng):
            def loss_fn(p):
                out, new_st = model.apply(
                    {"params": p, **st}, batch, training=True, rng=step_rng,
                    mutable=list(st))
                rec = out["metrics"]["mse"]
                total = sum(out["losses"].values()) \
                    + out["metrics"]["code_bits"] * 1e-6
                return total, (rec, new_st)
            (l, (rec, new_st)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), new_st, o, l, rec

        for epoch in range(self.num_epochs):
            for batch in loader:
                batch = jnp.asarray(batch)
                rng, step_rng = jax.random.split(rng)
                if is_vae:
                    params, opt, loss, rec, kl = vae_step(
                        params, opt, batch, step_rng)
                else:
                    params, extra, opt, loss, rec = vq_step(
                        params, extra, opt, batch, step_rng)
            self.logger.info(f"epoch {epoch}: loss={float(loss):.5f}")

        # eval metrics
        val = jnp.asarray(next(iter(loader)))
        if is_vae:
            out = model.apply({"params": params}, val, training=False)
            mse = float(jnp.mean((out["x_hat"] - val) ** 2))
            self.metric_dict = {
                "mse": mse, "psnr": -10.0 * np.log10(mse + 1e-12),
                "kl_per_dim": float(jnp.mean(out["kl"])
                                    / np.prod(val.shape[1:]))}
        else:
            out = model.apply({"params": params, **extra}, val,
                              training=False)
            mse = float(out["metrics"]["mse"])
            self.metric_dict = {"mse": mse,
                                "psnr": -10.0 * np.log10(mse + 1e-12),
                                "code_bits": float(
                                    out["metrics"]["code_bits"])}
        self.logger.info(f"final: {self.metric_dict}")
        self.save_metrics()
        return self.metric_dict

    def collect_metrics(self):
        return dict(self.metric_dict)

    def save_metrics(self):
        if self.output_dir is None:
            return
        import csv
        with open(self.output_path("metrics.csv"), "w") as f:
            w = csv.writer(f)
            for k, v in self.metric_dict.items():
                w.writerow([k, v])


config = ClassBuilder(
    StandaloneNNExperiment,
    model_name=ParamSlot(
        "model",
        choices=["vae", "vqvae", "vqvae-gssoft", "vqvae-pyramid",
                 "vqvae-multi"],
        default=os.environ.get("CBENCH_NN_MODEL", "vae")),
    beta=ParamSlot("beta", default=1.0),
).set_override_name("nn_standalone")
