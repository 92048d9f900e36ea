"""Dynamic per-image context kernels (TopoGroupDynamicMaskConv2d dynamic
kernels parity): hypernetwork-predicted depthwise context added to the
static context, identical on encode and decode paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph


def test_dynamic_kernel_roundtrip_and_gradient():
    model, specs = build_topogroup_hyperprior_graph(
        N=16, M=12, context_channels=24, y_stride=8, dynamic_kernel=True)
    codec = LatentGraphCodec(model, specs, alignment=32, coding_mode="tpu",
                             num_lanes=64)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
    codec.update_state()

    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    loss, _ = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: codec.loss_fn(p, x, jax.random.PRNGKey(2))[0])(
        codec.params)
    # the zero-init projection still receives gradient (no dead path)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(
        g["node_coders_y"]["dyn_proj"]))
    assert gn > 0

    img = SyntheticImageDataset(1, 32, 32).get_data_at(0)
    rec_tpu = codec.decompress(codec.compress(img))
    codec.coding_mode = "compat"
    rec_c = codec.decompress(codec.compress(img))
    np.testing.assert_array_equal(rec_tpu, rec_c)


def test_dynamic_kernel_rejects_weightmask_patterns():
    with pytest.raises(ValueError):
        model, specs = build_topogroup_hyperprior_graph(
            N=16, M=12, y_stride=8, pattern="scanline", dynamic_kernel=True)
        LatentGraphCodec(model, specs).init_params(
            jax.random.PRNGKey(0), input_shape=(1, 32, 32, 3))
