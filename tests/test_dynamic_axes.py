"""Dynamic-node product iteration + relative-FLOPs sandwich + λC adjust.

Parity: reference latent_graph.py:898-1078 (product iteration with
per-combination prefixes), :940-1000 (relative-FLOPs sandwich loss),
:1136-1166 (auto_adjust_lambda_flops linear/rejection).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.graph import build_basic_scalable_graph
from cbench_basic_tpu.train.dynamic_axes import (
    DynamicAxis,
    LambdaFlopsAdjuster,
    ProductLoss,
    combo_prefix,
    product_step_combos,
)


def _small_scalable_codec():
    model, specs, levels = build_basic_scalable_graph(
        N=32, M=48, widths=(16, 24, 32), pattern="checkerboard",
        num_channel_groups=1, context_channels=64, flops_weight=1e-12,
        flops_limit=0.0)
    codec = LatentGraphCodec(model, specs, alignment=64,
                             complexity_levels=levels)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return codec


def test_product_step_combos_sandwich_order_and_dedup():
    axes = [DynamicAxis("sclevel", [0, 1, 2]), DynamicAxis("vrlevel", [0, 1])]
    rng = np.random.default_rng(0)
    combos = product_step_combos(axes, rng, sandwich=True, training=True)
    # first = all-max, last = all-min (unless the sample collides)
    assert combos[0] == {"sclevel": 2, "vrlevel": 1}
    assert combos[-1] == {"sclevel": 0, "vrlevel": 0}
    keys = [tuple(sorted(c.items())) for c in combos]
    assert len(keys) == len(set(keys))  # deduped

    # eval: full product
    ev = product_step_combos(axes, rng, training=False)
    assert len(ev) == 6
    # fix_for_inference pins an axis
    axes[1].fix_for_inference = True
    axes[1].default_index = 0
    ev2 = product_step_combos(axes, rng, training=False)
    assert len(ev2) == 3 and all(c["vrlevel"] == 0 for c in ev2)

    assert combo_prefix({"sclevel": 2, "vrlevel": 0}) == "sclevel=2_vrlevel=0_"


def test_product_loss_prefixes_and_relative_flops():
    codec = _small_scalable_codec()
    sc_values = [codec._edge_levels_for(i) for i in range(3)]
    pl = ProductLoss(
        codec,
        sc_axis=DynamicAxis("sclevel", sc_values),
        vr_axis=DynamicAxis("vrlevel", [0.005, 0.02]),
        relative_flops=True,
        relative_flops_lambdas=[0.5, 1.0, 2.0])
    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    rng = np.random.default_rng(3)
    # Find a step whose sampled mid has a strictly-interior sclevel (a mid
    # sharing the endpoint's width has rel_flops exactly 0 or 1).
    for _ in range(50):
        combos = pl.step_combos(rng, training=True)
        if len(combos) == 3 and dict(combos[1])["sclevel"] == 1:
            break
    assert len(combos) == 3 and dict(combos[1])["sclevel"] == 1
    loss, metrics = pl(codec.params, x, jax.random.PRNGKey(0), combos,
                       flops_loss_mult=jnp.float32(1.0))
    assert np.isfinite(float(loss))
    mid = dict(combos[1])
    prefix = combo_prefix(mid)
    assert prefix + "rel_loss" in metrics
    assert prefix + "rel_flops" in metrics
    # rel_flops of the mid level lies in (0, 1): between min and max widths
    assert 0.0 < float(metrics[prefix + "rel_flops"]) < 1.0
    # per-combination prefixed bpp metrics exist for every combo
    for c in combos:
        assert combo_prefix(dict(c)) + "bpp" in metrics

    # gradient flows through the product loss
    g = jax.grad(lambda p: pl(p, x, jax.random.PRNGKey(1), combos)[0])(
        codec.params)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_lambda_flops_adjuster_linear_and_rejection():
    adj = LambdaFlopsAdjuster(method="linear", num_levels=3, loss_weight=0.5)
    # establish range (min/max update BEFORE the target, reference :1146)
    adj.observe(100.0, 0)
    adj.observe(400.0, 0)
    # sclevel 1 target = midpoint (250): running at 350 -> overshoot ->
    # multiplier increases (stronger FLOPs penalty)
    m0 = adj.mult
    mult, scale = adj.observe(350.0, 1)
    assert mult > m0 and scale == 1.0
    # under the midpoint target -> multiplier decreases
    m1 = adj.mult
    mult2, _ = adj.observe(150.0, 1)
    assert mult2 < m1

    rej = LambdaFlopsAdjuster(method="rejection", num_levels=3,
                              tolerance=0.1)
    rej.observe(100.0, 2)
    rej.observe(300.0, 0)
    # sclevel 2 target = min (100); 200 overshoots >10% -> rejected
    _, scale = rej.observe(200.0, 2)
    assert scale == 0.0
    # at/below target -> accepted
    _, scale2 = rej.observe(100.0, 2)
    assert scale2 == 1.0


def test_trainer_runs_product_mode():
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    codec = _small_scalable_codec()
    sc_values = [codec._edge_levels_for(i) for i in range(3)]
    pl = ProductLoss(codec, sc_axis=DynamicAxis("sclevel", sc_values),
                     vr_axis=DynamicAxis("vrlevel", [0.005, 0.02]),
                     relative_flops=True)
    data = [np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
            for _ in range(2)]
    trainer = NeuralCodecTrainer(
        dataloader=data, num_epochs=1, data_parallel=False, log_every=1,
        product_loss=pl,
        lambda_adjuster=LambdaFlopsAdjuster(method="linear", num_levels=3))
    metrics = trainer.train_module(codec)
    assert np.isfinite(metrics["loss"])
    assert any("sclevel=" in k for k in metrics)
