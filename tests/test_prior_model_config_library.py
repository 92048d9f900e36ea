"""Prior-model config library completion (reference configs/codecs/general/
prior_models/ — 22 model files, 11 bbv2 presets, 52 prior-coder files,
10 AR-offset choices) and the new ce (lossless cross-entropy) distortion
on LossyDummyCoder."""

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
PM = os.path.join(REPO, "configs", "codecs", "general", "prior_models")


@pytest.mark.parametrize("sub, expected", [
    ("", 22), ("presets", 11), ("prior_coders", 52),
    (os.path.join("prior_coders", "ar_offsets"), 10)])
def test_prior_model_configs_import(sub, expected):
    cfgs = import_all_config_from_dir(os.path.join(PM, sub))
    assert len(cfgs) == expected


def test_selected_prior_model_configs_build():
    for name in ("vae_vq", "vqvae_v2", "vqvae_selftrain",
                 "aev2_vqvae_v2backbone"):
        cfg = import_config_from_file(os.path.join(PM, name + ".py"))
        assert cfg.build_class() is not None, name


def test_lossless_autoencoder_ce_forward():
    cfg = import_config_from_file(
        os.path.join(PM, "base_lossless_autoencoder.py"))
    cfg.update_slot_params(groups=4, K=16, D=8, hidden=16)
    codec = cfg.build_class()
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    out = codec.model.apply({"params": codec.params}, x, training=True,
                            rng=jax.random.PRNGKey(1))
    ce = float(out["metrics"]["ce_bits_per_dim"])
    assert np.isfinite(ce) and ce > 0
    # ce gradient flows into the learned scale AND the decoder
    def loss(p):
        o = codec.model.apply({"params": p}, x, training=True,
                              rng=jax.random.PRNGKey(1))
        return o["losses"]["loss_distortion"]
    g = jax.grad(loss)(codec.params)
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_bbv2_presets_build_distinct_names():
    d = os.path.join(PM, "presets")
    names = set()
    for f in sorted(os.listdir(d)):
        if not f.endswith(".py"):
            continue
        cfg = import_config_from_file(os.path.join(d, f))
        codec = cfg.build_class()
        assert codec is not None
        names.add(cfg.name)
    assert len(names) == 11  # every preset derives a distinct exp name


def test_ar_offsets_choice_values():
    d = os.path.join(PM, "prior_coders", "ar_offsets")
    cfgs = import_all_config_from_dir(d)
    assert cfgs["none"] is None
    assert cfgs["clt"] == [(-1, 0, 0), (0, -1, 0), (0, 0, -1)]
    assert cfgs["ctx3"] == [(0, -1, 0), (0, 0, -1), (0, -1, -1)]
