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


# -- training augmentations ----------------------------------------------------
# Parity: the reference's torchvision augmentation stack used by its
# training dataset configs (RandomHorizontalFlip/RandomVerticalFlip/
# ColorJitter in configs/datasets image training pipelines).
def random_flip(img: np.ndarray, rng: np.random.Generator,
                horizontal: bool = True, vertical: bool = False) -> np.ndarray:
    if horizontal and rng.random() < 0.5:
        img = img[:, ::-1]
    if vertical and rng.random() < 0.5:
        img = img[::-1]
    return np.ascontiguousarray(img)


def random_rotate90(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Uniform 0/90/180/270-degree rotation (dihedral augmentation)."""
    return np.ascontiguousarray(np.rot90(img, k=int(rng.integers(4))))


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2) -> np.ndarray:
    """Brightness/contrast/saturation jitter on float [0,1] or uint8 HWC."""
    was_uint8 = img.dtype == np.uint8
    x = img.astype(np.float32) / (255.0 if was_uint8 else 1.0)
    if brightness > 0:
        x = x * (1.0 + float(rng.uniform(-brightness, brightness)))
    if contrast > 0:
        mean = x.mean()
        x = mean + (x - mean) * (1.0 + float(rng.uniform(-contrast, contrast)))
    if saturation > 0 and x.ndim == 3 and x.shape[-1] == 3:
        gray = x.mean(-1, keepdims=True)
        x = gray + (x - gray) * (1.0 + float(rng.uniform(-saturation,
                                                         saturation)))
    x = np.clip(x, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8) if was_uint8 else x


class Compose:
    """Sequential transform pipeline; entries take (img, rng)."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        for t in self.transforms:
            img = t(img, rng)
        return img
