"""Torch-checkpoint conversion: numerical equivalence torch vs flax.

Builds a miniature CompressAI-style hyperprior analysis stack in torch,
converts the state dict with tools/torch_checkpoint_to_tpu.py mappings, and
checks the flax model computes the same outputs (conv geometry, GDN
reparameterization, weight layout transposes).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tools")

import jax

# XLA's CPU convolutions run a reduced-precision path by default (~2e-3 vs
# fp64; torch is ~1e-7) — force full precision for numerical-equivalence
# checks of the weight mapping.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp

from torch_checkpoint_to_tpu import convert_conv, convert_gdn


class TorchGDN(torch.nn.Module):
    """CompressAI-style GDN with sqrt reparameterization."""

    def __init__(self, c, pedestal=2 ** -18):
        super().__init__()
        self.ped = pedestal ** 2
        beta = torch.sqrt(torch.rand(c) + 1.0 + self.ped)
        gamma = torch.sqrt(0.1 * torch.eye(c) + 0.01 * torch.rand(c, c) + self.ped)
        self.beta = torch.nn.Parameter(beta)
        self.gamma = torch.nn.Parameter(gamma)

    def forward(self, x):
        beta = self.beta ** 2 - self.ped
        gamma = (self.gamma ** 2 - self.ped).view(*self.gamma.shape, 1, 1)
        norm = torch.sqrt(torch.nn.functional.conv2d(x * x, gamma, beta))
        return x / norm


def test_conv_gdn_stack_equivalence():
    torch.manual_seed(0)
    c_in, c_out = 3, 6
    tconv = torch.nn.Conv2d(c_in, c_out, 5, stride=2, padding=2)
    tgdn = TorchGDN(c_out)

    x = torch.rand(1, c_in, 16, 16)
    with torch.no_grad():
        ref = tgdn(tconv(x)).numpy()

    state = {
        "conv.weight": tconv.weight.detach().numpy(),
        "conv.bias": tconv.bias.detach().numpy(),
        "gdn.beta": tgdn.beta.detach().numpy(),
        "gdn.gamma": tgdn.gamma.detach().numpy(),
    }

    from cbench_basic_tpu.nn.layers import GDN, conv as flax_conv
    from flax import linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            return GDN()(flax_conv(c_out)(x))

    model = Stack()
    x_nhwc = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    params = model.init(jax.random.PRNGKey(0), x_nhwc)["params"]
    params = {
        "Conv_0": convert_conv(state, "conv"),
        "GDN_0": convert_gdn(state, "gdn"),
    }
    out = model.apply({"params": params}, x_nhwc)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-4, atol=1e-5)


def test_entropy_bottleneck_conversion_shapes():
    from torch_checkpoint_to_tpu import convert_entropy_bottleneck

    c, f = 4, 4
    dims = (1, 3, 3, 3, 3, 1)
    state = {}
    for k in range(f + 1):
        state[f"eb._matrix{k}"] = np.random.rand(c, dims[k + 1], dims[k]).astype(np.float32)
        state[f"eb._bias{k}"] = np.random.rand(c, dims[k + 1], 1).astype(np.float32)
        if k < f:
            state[f"eb._factor{k}"] = np.random.rand(c, dims[k + 1], 1).astype(np.float32)
    state["eb.quantiles"] = np.random.rand(c, 1, 3).astype(np.float32)
    out = convert_entropy_bottleneck(state, "eb")

    # Keys/shapes line up with the flax EntropyBottleneck tree.
    from cbench_basic_tpu.nn.entropy_models import EntropyBottleneck
    eb = EntropyBottleneck(c)
    params = eb.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, c)),
                     training=False)["params"]
    assert set(out) == set(params)
    for k in out:
        assert out[k].shape == params[k].shape, k
