"""Image transforms for coding pipelines (host-side numpy; images are HWC).

Parity targets: AlignedCrop / AlignedPadding (reference
cbench/data/transforms.py:280-335) — neural codecs with S× downsampling need
inputs padded/cropped to multiples of S (64 for hyperprior stacks).
"""

from __future__ import annotations

import numpy as np


def aligned_crop(img: np.ndarray, alignment: int = 64) -> np.ndarray:
    """Center-crop H and W down to multiples of `alignment`."""
    h, w = img.shape[0], img.shape[1]
    nh, nw = (h // alignment) * alignment, (w // alignment) * alignment
    top, left = (h - nh) // 2, (w - nw) // 2
    return img[top:top + nh, left:left + nw]


def aligned_pad(img: np.ndarray, alignment: int = 64):
    """Replicate-pad H and W up to multiples of `alignment`.

    Returns (padded, (h, w)) with the original size for unpadding.
    """
    h, w = img.shape[0], img.shape[1]
    nh = -(-h // alignment) * alignment
    nw = -(-w // alignment) * alignment
    pad = [(0, nh - h), (0, nw - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="edge"), (h, w)


def unpad(img: np.ndarray, size) -> np.ndarray:
    h, w = size
    return img[:h, :w]


def random_crop(img: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    """Random spatial crop (training patches); pads first if too small."""
    h, w = img.shape[0], img.shape[1]
    if h < size or w < size:
        pad = [(0, max(0, size - h)), (0, max(0, size - w))] + [(0, 0)] * (img.ndim - 2)
        img = np.pad(img, pad, mode="reflect")
        h, w = img.shape[0], img.shape[1]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top:top + size, left:left + size]
