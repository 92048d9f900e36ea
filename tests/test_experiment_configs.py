"""Round-3 experiment/ablation config surface (VERDICT item #5).

Covers: the hyperprior-variant experiment file (lossy_graph_scalable_exp_hp)
with its five grouped variants incl. the new group-conv PGM backbone and the
SlimCAE slimmable entropy bottleneck; the topogroup ablation grid
(lossy_latent_graph_topogroup_abl) swept through the real CLI into >=6
distinct experiment directories; and the new topogroup patterns backing the
grid (reference pgm_coder.py:1425-1492).
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_new_topogroup_patterns_partition():
    from cbench_basic_tpu.graph.topogroup import topo_group_map

    for pat, groups, expect in [
            ("interlace-checkerboard", 2, 2),
            ("channelwise-checkerboard", 2, 4),
            ("half-checkerboard", 1, 2),
            ("halfinv-checkerboard", 1, 2),
            ("quarter-checkerboard", 1, 2),
            ("zigzag", 1, 8 + 8 - 1),
            ("channelwise-scanline", 2, 2 * 8 * 8)]:
        g, n = topo_group_map(pat, 8, 8, 4, num_channel_groups=groups)
        assert n == expect, pat
        assert int(g.min()) >= 0 and int(g.max()) < n, pat

    # half and halfinv are complementary partitions of the plane
    ga, _ = topo_group_map("half-checkerboard", 8, 8, 1)
    gb, _ = topo_group_map("halfinv-checkerboard", 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(1 - ga), np.asarray(gb))

    # interlace: alternate channel groups carry opposite checkerboard phase
    g, _ = topo_group_map("interlace-checkerboard", 4, 4, 4,
                          num_channel_groups=2)
    g = np.asarray(g)
    np.testing.assert_array_equal(g[..., 0], 1 - g[..., 2])

    # elic with the reference channel split (1,1,2,4,rest)
    g, n = topo_group_map("elic", 4, 4, 24, num_channel_groups=12,
                          channel_splits=(1, 1, 2, 4, 4))
    assert n == 10
    g = np.asarray(g)
    # first 16-channel-group alone in split 0 -> groups {0,1}
    assert set(np.unique(g[..., :2])) == {0, 1}


def test_interlace_checkerboard_roundtrip_coding():
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph

    model, specs = build_topogroup_hyperprior_graph(
        N=8, M=12, pattern="interlace-checkerboard", num_channel_groups=2,
        context_channels=24, y_stride=8)
    codec = LatentGraphCodec(model, specs, alignment=32)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    codec.update_state()
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    out = codec.decompress(codec.compress(img))
    assert np.asarray(out).shape == img.shape


def test_hp_variants_loss_and_flops():
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph.builders import (
        HP_VARIANTS,
        build_scalable_hyperprior_graph,
    )

    batch = jnp.asarray(
        np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    flops_per_variant = {}
    for v in HP_VARIANTS:
        model, specs, levels = build_scalable_hyperprior_graph(
            v, N=16, M=24, widths=(8, 12, 16), groups=2, mid_per_group=8)
        codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                                 alignment=64)
        codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
        loss, metrics = jax.jit(codec.loss_fn)(
            codec.params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), v
        if v != "static-backbone":
            assert len(levels) == 3, v
            flops_per_variant[v] = float(metrics["flops"])
    # the us-decoder variant skips the encoder-side slimmable FLOPs
    assert (flops_per_variant["usdecoder-dynamic"]
            < flops_per_variant["slimmable-dynamic"])


def test_slimmable_factorized_coder_masks_rate():
    """SlimCAE z bottleneck: lower sclevel -> fewer active channels -> lower
    z rate, masked channels decode to exactly zero."""
    from cbench_basic_tpu.graph.node_coders import SlimmableFactorizedCoder

    coder = SlimmableFactorizedCoder(8, channels_list=(2, 4, 8))
    z = jnp.asarray(np.random.default_rng(0).normal(0, 3, (1, 4, 4, 8)),
                    jnp.float32)
    params = coder.init(jax.random.PRNGKey(0), z, training=False)

    outs = [coder.apply(params, z, training=False, sclevel=l)
            for l in range(3)]
    rates = [float(-jnp.log2(o["likelihood"]).sum()) for o in outs]
    assert rates[0] < rates[1] < rates[2]
    np.testing.assert_array_equal(
        np.asarray(outs[0]["value_hat"][..., 2:]), 0.0)


def test_groupconv_transform_flops_scale_with_level():
    from cbench_basic_tpu.nn.groupconv import GroupConvTransform

    t = GroupConvTransform(kind="a", groups=4, num_levels=4,
                           mid_per_group=8, in_channels=3, out_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = t.init(jax.random.PRNGKey(0), x, 3)
    flops = [t.flops(x.shape, l) for l in range(4)]
    assert flops[0] < flops[-1]
    out = t.apply(params, x, 1)
    assert out.shape == (1, 4, 4, 16)


@pytest.mark.slow
def test_abl_grid_cli_sweep_six_dirs(tmp_path):
    """VERDICT #5 done-criterion: a sweep run producing >=6 experiment dirs
    with distinct slot-derived names through the real CLI."""
    exps = ",".join([
        "hyperprior-ar-base",
        "hyperprior-ar-channelwise-g2-ft",
        "hyperprior-ar-interlace-checkerboard-g2-ft",
        "hyperprior-ar-raster2x2-ft",
        "hyperprior-ar-channelwise-checkerboard-g2-ft",
        "hyperprior-ar-elic-ft",
    ])
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        CBENCH_SMALL="1", CBENCH_EPOCHS="1", CBENCH_BATCH="2",
        CBENCH_PATCH="64", CBENCH_STEPS_PER_EPOCH="2",
        CBENCH_TEST_ITEMS="1", CBENCH_TEST_H="64", CBENCH_TEST_W="64",
        CBENCH_ABL_EXPS=exps,
    )
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "run_benchmark.py"),
         os.path.join(ROOT, "configs", "lossy_latent_graph_topogroup_abl.py"),
         "-o", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=5000)
    assert out.returncode == 0, out.stderr[-3000:]
    exp_dirs = [d for d in os.listdir(tmp_path) if os.path.isdir(tmp_path / d)]
    assert len(exp_dirs) >= 6, exp_dirs
    assert len(set(exp_dirs)) == len(exp_dirs), exp_dirs
    # slot-derived names (long ones hash-trimmed; the default-slot exp names
    # as the bare experiment): fragments survive the trimming
    names = " ".join(exp_dirs)
    for frag in ("channel", "interla", "raster2x2", "elic"):
        assert frag in names, (frag, exp_dirs)
    for d in exp_dirs:
        assert (tmp_path / d / "metrics.csv").exists()


def test_hp_config_file_imports_all_variants():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", CBENCH_SMALL="1", CBENCH_HP_VARIANT="all")
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "from cbench_basic_tpu.config import import_config_from_file\n"
         "cfg = import_config_from_file("
         f"r'{os.path.join(ROOT, 'configs', 'lossy_graph_scalable_exp_hp.py')}')\n"
         "names = [b.name for b in cfg]\n"
         "assert len(names) == 5, names\n"
         "assert len(set(names)) == 5, names\n"
         "print(names)"],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
