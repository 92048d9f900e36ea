"""Image distortion metrics in JAX (PSNR, SSIM, MS-SSIM).

Capability parity with the reference's PytorchBatchedDistortion
(cbench/benchmark/metrics/pytorch_distortion.py:21, backed by
pytorch_msssim), reimplemented as jittable JAX ops so distortion is computed
on-device next to the codec instead of on the host.

Convention: images are NHWC float in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-batch-mean PSNR in dB."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian blur, NHWC, VALID padding.

    precision=HIGHEST: on TPU the default conv precision truncates inputs
    to bf16, which destroys the covariance terms sigma = E[xy] - E[x]E[y]
    (values ~1, true differences ~1e-3) and produced MS-SSIM > 1 / < 0 on
    device while CPU results were exact."""
    c = img.shape[-1]
    kh = jnp.tile(kernel.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    img = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID", dimension_numbers=dn,
                                       feature_group_count=c,
                                       precision=jax.lax.Precision.HIGHEST)
    img = jax.lax.conv_general_dilated(img, kw, (1, 1), "VALID", dimension_numbers=dn,
                                       feature_group_count=c,
                                       precision=jax.lax.Precision.HIGHEST)
    return img


def _ssim_components(a, b, kernel, max_val):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _blur(a, kernel)
    mu_b = _blur(b, kernel)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = _blur(a * a, kernel) - mu_aa
    sig_b = _blur(b * b, kernel) - mu_bb
    sig_ab = _blur(a * b, kernel) - mu_ab
    cs = (2 * sig_ab + c2) / (sig_a + sig_b + c2)
    ssim = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return ssim.mean(), cs.mean()


@functools.partial(jax.jit, static_argnames=("max_val", "win_size"))
def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         win_size: int = 11) -> jnp.ndarray:
    kernel = _gaussian_kernel(win_size, 1.5)
    s, _ = _ssim_components(a.astype(jnp.float32), b.astype(jnp.float32), kernel, max_val)
    return s


@functools.partial(jax.jit, static_argnames=("max_val", "win_size"))
def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
            win_size: int = 11) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al.), 5 scales, matching pytorch_msssim
    defaults. Images must be at least 11*2^4 = 176 px on each side."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    kernel = _gaussian_kernel(win_size, 1.5)
    vals = []
    for i, w in enumerate(_MSSSIM_WEIGHTS):
        s, cs = _ssim_components(a, b, kernel, max_val)
        vals.append(jnp.maximum(s if i == len(_MSSSIM_WEIGHTS) - 1 else cs, 0.0) ** w)
        if i < len(_MSSSIM_WEIGHTS) - 1:
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4.0
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4.0
    return jnp.prod(jnp.stack(vals))
