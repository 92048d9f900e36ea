"""The ssim-ft 2-stage flow, end to end.

Parity: the reference's `hyperprior-ar-sc-slimmable-full-dynamic-grouped
-ft-ssim` preset loads the stage-1 (MSE) checkpoints through
ClassBuilderObjRef(stage1_trainer, obj_func=get_trainer_output_param_file)
(presets/lossy_latent_graph_scalable_ar_models.py:708-727) and fine-tunes
with the MS-SSIM objective. Here: stage 1 trains a few steps, its params
flow into the stage-2 builder via ClassBuilderObjRef, and a stage-2
MS-SSIM step updates them.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "configs"))

from cbench_basic_tpu.config import ClassBuilder, ClassBuilderObjRef

SMALL = dict(widths=(8, 12), n=16, m=16)


def _one_adam_step(codec, x, lr=1e-4):
    tx = optax.adam(lr)
    opt = tx.init(codec.params)
    (loss, _), grads = jax.value_and_grad(codec.loss_fn, has_aux=True)(
        codec.params, x, jax.random.PRNGKey(0))
    updates, _ = tx.update(grads, opt, codec.params)
    codec.params = optax.apply_updates(codec.params, updates)
    return float(loss)


def test_stage2_ft_ssim_flow():
    from presets.lossy_latent_graph_scalable_ar_models import (
        hyperprior_ar_sc_slimmable_full_dynamic_grouped,
        hyperprior_ar_sc_slimmable_full_dynamic_grouped_ft_ssim,
    )

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)

    # stage 1: the MSE-objective grouped preset, trained one step per codec
    stage1 = ClassBuilder(
        hyperprior_ar_sc_slimmable_full_dynamic_grouped, **SMALL
    ).share_built_object()
    grouped1 = stage1.build_class()
    for c in grouped1.codecs:
        loss = _one_adam_step(c, x)
        assert np.isfinite(loss)

    # stage 2: ft-ssim preset pulls the stage-1 params via obj-ref — the
    # TPU-side equivalent of the reference's trainer-output param file ref.
    stage2 = ClassBuilder(
        hyperprior_ar_sc_slimmable_full_dynamic_grouped_ft_ssim,
        stage1_params=ClassBuilderObjRef(
            stage1, obj_func=lambda g: [c.params for c in g.codecs]),
        **SMALL)
    grouped2 = stage2.build_class()

    # weights transferred (pytrees equal to stage-1 post-training state)
    for c1, c2 in zip(grouped1.codecs, grouped2.codecs):
        leaves1 = jax.tree_util.tree_leaves(c1.params)
        leaves2 = jax.tree_util.tree_leaves(c2.params)
        assert all(np.array_equal(a, b) for a, b in zip(leaves1, leaves2))

    # stage-2 objective is MS-SSIM, and a fine-tune step moves the params
    c2 = grouped2.codecs[0]
    assert c2.model.node_coders["x"].distortion == "ms_ssim"
    before = jax.tree_util.tree_leaves(c2.params)[0].copy()
    loss2 = _one_adam_step(c2, x)
    assert np.isfinite(loss2)
    after = jax.tree_util.tree_leaves(c2.params)[0]
    assert not np.array_equal(before, after)


def test_stage2_metrics_report_ms_ssim_loss():
    from presets.lossy_latent_graph_scalable_ar_models import (
        hyperprior_ar_sc_slimmable_full_dynamic_grouped_ft_ssim,
    )
    grouped = hyperprior_ar_sc_slimmable_full_dynamic_grouped_ft_ssim(**SMALL)
    c = grouped.codecs[0]
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    loss, metrics = c.loss_fn(c.params, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # the distortion term is 1-SSIM-shaped, scaled by 255^2 to match the
    # reference's num_elem scaling (latent_graph.py:93-96) so the same
    # lambda list serves the MSE stage and the ssim fine-tune stage
    lam = c.model.node_coders["x"].lmbda
    bound = float(lam) * 255.0 ** 2
    assert 0.0 <= float(metrics["loss_distortion"]) <= bound + 1e-6
    assert float(metrics["loss_distortion"]) > float(lam)  # 255^2 scaling on
