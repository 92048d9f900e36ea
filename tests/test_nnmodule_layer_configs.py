"""Per-file nnmodules layer config library (reference
configs/nnmodules/layers/{,pgm/,param_generator/} — one config per
backbone/generator) + the new slimmable Cheng2020/ELIC/SFMA backbones
(nn/backbones.py; parity pgm_layers.py:898-1270)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.config.import_utils import (
    import_all_config_from_dir,
    import_config_from_file,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
LAYERS = os.path.join(REPO, "configs", "nnmodules", "layers")


@pytest.mark.parametrize("sub, expected", [
    ("", 13), ("pgm", 37), ("param_generator", 15)])
def test_all_layer_configs_build(sub, expected):
    cfgs = import_all_config_from_dir(os.path.join(LAYERS, sub))
    assert len(cfgs) == expected
    for name, cfg in cfgs.items():
        obj = cfg.build_class()
        assert obj is not None, name


def test_cheng2020_edge_through_config():
    cfg = import_config_from_file(
        os.path.join(LAYERS, "pgm", "slimmable_cheng2020_a.py"))
    cfg.update_slot_params(widths=(8, 12), M=16)
    edge = cfg.build_class()
    x = jnp.ones((1, 32, 32, 3))
    params = edge.init(jax.random.PRNGKey(0), x, level=0)
    y0, f0 = edge.apply(params, x, level=0)
    y1, f1 = edge.apply(params, x, level=1)
    assert y0.shape == (1, 2, 2, 16) and y1.shape == (1, 2, 2, 16)
    assert f1 > f0 > 0  # wider level costs more FLOPs
    # soft-mixture training path is traced with the same params
    ys, fs = edge.apply(params, x, soft=True)
    assert np.isfinite(np.asarray(ys)).all() and float(fs) > 0


def test_elic_synthesis_roundtrip_shape():
    cfg = import_config_from_file(
        os.path.join(LAYERS, "pgm", "slimmable_elic_s.py"))
    cfg.update_slot_params(widths=(8, 12), M=16)
    edge = cfg.build_class()
    z = jnp.ones((1, 2, 2, 16))
    params = edge.init(jax.random.PRNGKey(0), z, level=1)
    y, _ = edge.apply(params, z, level=1)
    assert y.shape == (1, 32, 32, 3)


def test_sfma_modulator_changes_output():
    cfg = import_config_from_file(
        os.path.join(LAYERS, "pgm", "slimmable_sfma_hyperprior.py"))
    cfg.update_slot_params(widths=(8, 12), M=16,
                           sfma_mid_widths=(4, 6), num_modulators=2)
    edge = cfg.build_class()
    t = edge.transform
    x = jnp.ones((1, 32, 32, 3))
    params = t.init(jax.random.PRNGKey(0), x, 0, 1)
    y_off = t.apply(params, x, 0, 0)
    y_on = t.apply(params, x, 0, 2)
    assert y_off.shape == y_on.shape == (1, 2, 2, 16)
    assert float(jnp.abs(y_on - y_off).mean()) > 0
    # idx choice must not change the param tree (checkpoint stability)
    p2 = t.init(jax.random.PRNGKey(0), x, 0, 0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_groupconv_agg_variants_build_and_run():
    z = jnp.ones((1, 2, 2, 16))
    for name in ("hyperprior_s_agg", "hyperprior_s_agg_v2_pre",
                 "hyperprior_s_no_agg_out"):
        cfg = import_config_from_file(os.path.join(LAYERS, "pgm",
                                                   name + ".py"))
        cfg.update_slot_params(groups=4, levels=3, mid_per_group=4,
                               in_channels=16, out_channels=8)
        edge = cfg.build_class()
        params = edge.init(jax.random.PRNGKey(0), z, level=1)
        y, fl = edge.apply(params, z, level=1)
        assert y.shape == (1, 32, 32, 8) and fl > 0, name


def test_adaptive_resize_and_vqvae_layers():
    cfg = import_config_from_file(os.path.join(LAYERS, "adaptive_resize.py"))
    cfg.update_slot_params(in_channels=8, num_downsample_layers=1,
                           adaptive_output_spatial_size=2)
    m = cfg.build_class()
    x = jnp.ones((1, 16, 16, 8))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 2, 2, 8)

    enc = import_config_from_file(
        os.path.join(LAYERS, "vqvae_encoder.py")).build_class()
    dec = import_config_from_file(
        os.path.join(LAYERS, "vqvae_decoder.py")).build_class()
    img = jnp.ones((1, 16, 16, 3))
    z = enc.apply(enc.init(jax.random.PRNGKey(0), img), img)
    assert z.shape == (1, 4, 4, 64)
    out = dec.apply(dec.init(jax.random.PRNGKey(1), z), z)
    assert out.shape == (1, 16, 16, 3)


def test_param_generator_configs_produce_values():
    d = os.path.join(LAYERS, "param_generator")
    inc = import_config_from_file(os.path.join(d, "increasing_vector.py"))
    m = inc.build_class()
    v = m.apply(m.init(jax.random.PRNGKey(0)))
    assert np.all(np.diff(np.asarray(v)) >= 0)

    ct = import_config_from_file(os.path.join(d, "convtranspose2d.py"))
    ct.update_slot_params(in_channels=8, out_channels=4, num_upsamples=2)
    g = ct.build_class()
    out = g.apply(g.init(jax.random.PRNGKey(0)))
    assert out.shape[-1] == 4 and out.shape[1] == 16  # 4 * 2**2

    wrap = import_config_from_file(
        os.path.join(d, "nnmodule_param_wrapper.py"))
    from flax import linen as nn
    wrap.update_slot_params(module=nn.Dense(3), input_shape=(1, 4))
    w = wrap.build_class()
    params = w()
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
