"""EntroFormer attention context + channel-causal 3D conv context.

Parity: GaussianEntroFormerPriorCoder / ConditionalTopoGroup...EntroFormer
(reference pgm_coder.py:3217-3282) and TopoGroupDynamicMaskConv3d
(pgm_coder.py:2481); attention layer stack (nn/layers/attention.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
from cbench_basic_tpu.nn.attention import (
    EntroFormerContext,
    LinearAttention,
    MultiHeadAttention,
    SpatialSelfAttention,
    TransformerBlock,
)


def test_attention_layer_shapes_and_masking():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 32))
    attn = MultiHeadAttention(heads=4, dim_head=8)
    params = attn.init(jax.random.PRNGKey(1), x)
    out = attn.apply(params, x)
    assert out.shape == x.shape

    # A -inf key bias removes that key's influence: perturbing a fully
    # masked token must not change any output row.
    bias = jnp.zeros((1, 1, 12, 12)).at[..., 5].set(-1e9)
    out_m = attn.apply(params, x, bias=bias)
    x2 = x.at[:, 5].add(100.0)
    out_m2 = attn.apply(params, x2, bias=bias)
    np.testing.assert_allclose(np.asarray(out_m[:, :5]),
                               np.asarray(out_m2[:, :5]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m[:, 6:]),
                               np.asarray(out_m2[:, 6:]), atol=1e-5)

    blk = TransformerBlock(heads=4, dim_head=8)
    p = blk.init(jax.random.PRNGKey(2), x)
    assert blk.apply(p, x).shape == x.shape

    img = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16))
    for mod in (LinearAttention(heads=2, dim_head=8), SpatialSelfAttention()):
        p = mod.init(jax.random.PRNGKey(4), img)
        assert mod.apply(p, img).shape == img.shape


def test_entroformer_context_key_mask_causality():
    """Keys outside the mask must not affect the output."""
    ctx = EntroFormerContext(out_channels=8, dim_embed=16, depth=1, heads=2,
                             dim_head=8)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 6))
    km = jnp.zeros((1, 4, 4), bool).at[:, :2].set(True)
    params = ctx.init(jax.random.PRNGKey(1), y, km)
    out1 = ctx.apply(params, y, km)
    # Perturb a masked-out position's value; zero its input as the coder
    # does (visibility zeroing) — output must be identical.
    y2 = y.at[:, 3, 3].add(50.0)
    vis1 = jnp.where(km[..., None], y, 0.0)
    vis2 = jnp.where(km[..., None], y2, 0.0)
    np.testing.assert_allclose(
        np.asarray(ctx.apply(params, vis1, km)),
        np.asarray(ctx.apply(params, vis2, km)), atol=1e-6)
    assert out1.shape == (1, 4, 4, 8)


def test_entroformer_windowed_matches_shape():
    ctx = EntroFormerContext(out_channels=4, dim_embed=16, depth=1, heads=2,
                             dim_head=8, window=4)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 6))
    km = jnp.ones((1, 8, 8), bool)
    params = ctx.init(jax.random.PRNGKey(1), y, km)
    assert ctx.apply(params, y, km).shape == (1, 8, 8, 4)


@pytest.mark.parametrize("kwargs", [
    dict(pattern="checkerboard", context_type="attention",
         attn_dim_embed=32, attn_depth=1, attn_heads=2),
    dict(pattern="elic", num_channel_groups=2, context_type="attention",
         attn_dim_embed=32, attn_depth=1, attn_heads=2),
    dict(pattern="channelwise", num_channel_groups=4,
         context_type="maskconv3d"),
], ids=["attn_checkerboard", "attn_elic", "maskconv3d_channelwise"])
def test_context_codec_roundtrip_and_tpu_mode(kwargs):
    """Training forward + compat round-trip + TPU fused mode bit-identical
    reconstruction for the new context backbones."""
    model, specs = build_topogroup_hyperprior_graph(
        N=24, M=16, context_channels=32, y_stride=8, **kwargs)
    codec = LatentGraphCodec(model, specs, alignment=32, coding_mode="tpu",
                             num_lanes=64)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    codec.update_state()

    x = jnp.asarray(SyntheticImageDataset(1, 32, 32).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), metrics

    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    stream_tpu = codec.compress(img)
    rec_tpu = codec.decompress(stream_tpu)
    codec.coding_mode = "compat"
    stream_c = codec.compress(img)
    rec_c = codec.decompress(stream_c)
    assert rec_tpu.shape == img.shape
    np.testing.assert_array_equal(rec_tpu, rec_c)


def test_maskconv3d_is_channel_causal():
    """The 3D context for channel group g must not depend on groups >= g."""
    from cbench_basic_tpu.graph.topogroup import TopoGroupGaussianCoder

    coder = TopoGroupGaussianCoder(
        channels=8, pattern="channelwise", num_channel_groups=4,
        context_channels=12, context_type="maskconv3d")
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
    prior = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 16))
    params = coder.init(jax.random.PRNGKey(2), y, prior=prior,
                        training=False)["params"]
    ctx = coder.apply({"params": params}, y,
                      method=lambda m, v: m._ctx3d(v))
    # group 2 context: perturb channels of groups 2,3 (channels 4..8)
    y2 = y.at[..., 4:].add(10.0)
    ctx2 = coder.apply({"params": params}, y2,
                       method=lambda m, v: m._ctx3d(v))
    np.testing.assert_allclose(np.asarray(ctx[..., 2, :]),
                               np.asarray(ctx2[..., 2, :]), atol=1e-5)
    # but group 3 context sees group 2's channels
    assert not np.allclose(np.asarray(ctx[..., 3, :]),
                           np.asarray(ctx2[..., 3, :]))
