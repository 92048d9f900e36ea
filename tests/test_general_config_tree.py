"""The configs/codecs/general sub-config tree (reference parity:
configs/codecs/general/** — base / lz77 pipelines / entropy_models /
preprocessors / prior_models/prior_coders) builds and the composed codecs
round-trip.
"""

import glob
import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE = os.path.join(REPO, "configs", "codecs", "general")

# Slot-only composition bases: building without filling mandatory slots
# is expected to fail, so only importability is checked.
_SLOT_ONLY = ("base.py", "grouped_variable_rate.py", "base_autoencoder.py")


def _load(path):
    spec = importlib.util.spec_from_file_location(
        path.replace(os.sep, "_")[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _all_config_files():
    return sorted(glob.glob(os.path.join(TREE, "**", "*.py"), recursive=True))


def test_tree_is_populated():
    files = _all_config_files()
    assert len(files) >= 80
    # every reference subtree is represented
    for sub in ("entropy_models", "preprocessors",
                os.path.join("prior_models", "prior_coders")):
        assert any(os.path.join(TREE, sub) in f for f in files), sub


@pytest.mark.parametrize("path", _all_config_files(),
                         ids=lambda p: os.path.relpath(p, TREE))
def test_config_builds(path):
    mod = _load(path)
    cfg = mod.config
    if not hasattr(cfg, "build_class"):
        return  # plain-value configs (ar_offsets patterns)
    if path.endswith(_SLOT_ONLY):
        assert list(cfg.iter_slots())
        return
    obj = cfg.build_class()
    assert obj is not None


def test_lz77_tans_zstd_pipeline_roundtrip():
    """The composed lz77_tans_zstd codec (LZ77Preprocessor -> grouped
    zstd-style tANS sequence coder) round-trips and compresses."""
    mod = _load(os.path.join(TREE, "lz77_tans_zstd.py"))
    codec = mod.config.build_class()
    rng = np.random.default_rng(3)
    corpus = (b"the quick brown fox jumps over the lazy dog " * 300
              + bytes(rng.integers(0, 256, 500, dtype=np.uint8)))
    out = codec.compress(corpus)
    assert codec.decompress(out) == corpus
    assert len(out) < len(corpus) // 2


def test_lz77_fse_pipeline_roundtrip():
    mod = _load(os.path.join(TREE, "lz77_fse.py"))
    codec = mod.config.build_class()
    corpus = bytes(range(256)) * 40
    out = codec.compress(corpus)
    assert codec.decompress(out) == corpus


def test_grouped_lz77_entropy_codec_roundtrip():
    from cbench_basic_tpu.codecs.fse_codecs import GroupedLZ77EntropyCodec
    from cbench_basic_tpu.codecs.lz77 import lz77_detokenize, lz77_tokenize

    rng = np.random.default_rng(0)
    corpus = (b"abcabcabd" * 500
              + bytes(rng.integers(0, 64, 2000, dtype=np.uint8)))
    tokens = lz77_tokenize(corpus)
    g = GroupedLZ77EntropyCodec()
    assert g.decompress(g.compress(tokens)) == bytes(tokens)
    assert lz77_detokenize(g.decompress(g.compress(tokens))) == corpus
    # empty / literal-only streams
    t0 = lz77_tokenize(b"xyz")
    assert g.decompress(g.compress(t0)) == bytes(t0)
    assert g.decompress(g.compress(b"")) == b""


def test_tans_byte_codec_roundtrip_and_rate():
    from cbench_basic_tpu.codecs.fse_codecs import TansByteCodec

    rng = np.random.default_rng(1)
    skewed = bytes(rng.integers(0, 16, 8000, dtype=np.uint8))
    c = TansByteCodec()
    enc = c.compress(skewed)
    assert c.decompress(enc) == skewed
    assert len(enc) < len(skewed) * 0.7  # 4-bit alphabet ≪ 8 bits/byte


def test_add_all_kwargs_as_param_slot():
    from cbench_basic_tpu.config import ClassBuilder, ParamSlot

    def target(a, b=2, c="x", *args, d=None, **kw):
        return (a, b, c, d)

    cb = ClassBuilder(target, 1, c=ParamSlot("c", default="x"))
    cb.add_all_kwargs_as_param_slot(exclude=("d",))
    slots = [name for name, _, _ in cb.iter_slots()]
    assert "b" in slots        # defaulted kwarg became a slot
    assert "d" not in slots    # excluded
    assert cb.build_class() == (1, 2, "x", None)
    cb.update_slot_params(b=7)
    assert cb.build_class() == (1, 7, "x", None)


def test_lz77_preprocessor_protocol():
    from cbench_basic_tpu.codecs.lz77 import LZ77Preprocessor

    p = LZ77Preprocessor()
    data = b"hello hello hello hello" * 20
    tokens, side = p.preprocess(data)
    assert side == b""
    assert p.postprocess(tokens, side) == data
    # trained dictionary shrinks the token stream for tiny inputs
    p2 = LZ77Preprocessor()
    p2.train_full([data[:100]] * 8, dict_size=256)
    t2, _ = p2.preprocess(data[:100])
    assert p2.postprocess(t2) == data[:100]
    assert len(t2) <= len(p.preprocess(data[:100])[0])


def test_combined_and_sf_dummy_node_coders():
    import jax
    import jax.numpy as jnp

    from cbench_basic_tpu.graph.node_coders import (
        CombinedLossyCoder,
        StraightForwardDummyCoder,
    )

    x = jnp.ones((1, 32, 32, 3)) * 0.5
    xh = x + 0.1
    comb = CombinedLossyCoder(lmbda=1.0, distortions=("mse", "ms_ssim"))
    params = comb.init(jax.random.PRNGKey(0), x, prior=xh)
    out = comb.apply(params, x, prior=xh)
    assert np.isfinite(float(out["loss_distortion"]))
    assert float(out["loss_distortion"]) > 0
    # blend_weight zeroes a branch
    out0 = comb.apply(params, x, prior=xh, blend_weight=(0.0, 0.0))
    assert float(out0["loss_distortion"]) == 0.0

    sf = StraightForwardDummyCoder()
    p2 = sf.init(jax.random.PRNGKey(0), x, prior=xh)
    o2 = sf.apply(p2, x, prior=xh)
    assert float(o2["loss_distortion"]) == 0.0
    assert np.allclose(np.asarray(o2["value_hat"]), np.asarray(xh))


def test_trainer_config_dir_choices():
    """trainer_configs / model_wrapper_configs / param_scheduler_configs
    directories-as-choice-enums (reference nn_trainer.py:14-24)."""
    from cbench_basic_tpu.config.import_utils import import_config_from_file

    path = os.path.join(REPO, "configs", "trainer", "nn_trainer.py")
    cfg = import_config_from_file(path)
    cfg.update_slot_params(model_wrapper_config="emvb_adabelief_e6",
                           trainer_config="mesh_dp_clipgrad",
                           param_scheduler_config="pgm_exp100")
    t = cfg.build_class()
    assert t.optimizer == "adabelief" and t.learning_rate == 1e-6
    assert t.grad_clip == 1.0 and t.data_parallel
    names = [s.name for s in t.param_schedulers]
    assert names == ["gs_temp", "mc_loss_weight", "random_mask_weight"]
    assert abs(t.param_schedulers[0].value(100) - 1.0) < 1e-6
    assert t.param_schedulers[1].value(101) == 1.0
    # choice names surface in the derived experiment name
    assert "model_wrapper_config=emvb_adabelief_e6" in cfg.name

    # sgd family builds a working optimizer
    from cbench_basic_tpu.train.trainer import make_rd_optimizer
    import jax
    import jax.numpy as jnp
    tx = make_rd_optimizer(1e-2, optimizer="sgd")
    params = {"w": jnp.ones(3), "eb": {"quantiles": jnp.ones(2)}}
    st = tx.init(params)
    up, _ = tx.update(jax.tree.map(jnp.ones_like, params), st, params)
    assert np.isfinite(float(up["w"][0]))
