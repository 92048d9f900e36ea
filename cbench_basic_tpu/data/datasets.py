"""Datasets and dataloader interface.

Parity: reference cbench/data/base.py:4-24 (get_length/iterate/get_data_at)
and datasets/torchvision_datasets.py (image folder with crop/pad). Images
are numpy uint8 HWC (NHWC batches) — the TPU-native layout.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from .transforms import random_crop

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp"}


class DataLoaderInterface:
    def get_length(self) -> int:
        raise NotImplementedError

    def __len__(self):
        return self.get_length()

    def iterate(self) -> Iterator:
        raise NotImplementedError

    def __iter__(self):
        return self.iterate()

    def get_data_at(self, idx: int):
        raise NotImplementedError


class ImageFolderDataset(DataLoaderInterface):
    """All images under a directory, as uint8 HWC arrays.

    crop_size: if set, random-crop to (crop_size, crop_size) (training).
    """

    def __init__(self, root: str, crop_size: Optional[int] = None,
                 seed: int = 0, max_items: Optional[int] = None):
        self.root = Path(root)
        self.files = sorted(
            p for p in self.root.rglob("*") if p.suffix.lower() in _IMG_EXTS)
        if max_items is not None:
            self.files = self.files[:max_items]
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)

    def get_length(self) -> int:
        return len(self.files)

    def get_data_at(self, idx: int) -> np.ndarray:
        from PIL import Image
        img = np.asarray(Image.open(self.files[idx]).convert("RGB"))
        if self.crop_size is not None:
            img = random_crop(img, self.crop_size, self.rng)
        return img

    def iterate(self):
        for i in range(len(self.files)):
            yield self.get_data_at(i)


class SyntheticImageDataset(DataLoaderInterface):
    """Deterministic pseudo-natural images for tests/benchmarks: smooth
    low-frequency fields plus noise, so neural codecs see non-trivial but
    compressible content."""

    def __init__(self, num_items: int = 4, height: int = 256, width: int = 256,
                 channels: int = 3, seed: int = 0):
        self.num_items = num_items
        self.shape = (height, width, channels)
        self.seed = seed

    def get_length(self) -> int:
        return self.num_items

    def get_data_at(self, idx: int) -> np.ndarray:
        h, w, c = self.shape
        rng = np.random.default_rng(self.seed + idx)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.zeros((h, w, c), np.float32)
        for ch in range(c):
            for _ in range(4):
                fy, fx = rng.uniform(0.5, 4, 2)
                ph = rng.uniform(0, 2 * np.pi, 2)
                img[..., ch] += np.sin(2 * np.pi * fy * yy / h + ph[0]) * \
                    np.cos(2 * np.pi * fx * xx / w + ph[1])
        img = (img - img.min()) / (np.ptp(img) + 1e-6)
        img = img * 0.8 + rng.normal(0, 0.02, (h, w, c))
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def iterate(self):
        for i in range(self.num_items):
            yield self.get_data_at(i)


def _discover_bundled_photos() -> list:
    """Real photographs shipped inside installed packages (zero-egress
    environments have no Kodak, but sklearn/matplotlib bundle genuine
    photos). Returns a sorted list of Paths; empty if none found."""
    candidates = []
    try:
        import sklearn.datasets as _skd
        img_dir = Path(os.path.dirname(_skd.__file__)) / "images"
        candidates += sorted(img_dir.glob("*.jpg"))
    except ImportError:
        pass
    try:
        import matplotlib
        sd = Path(os.path.dirname(matplotlib.__file__)) / "mpl-data" / "sample_data"
        candidates += sorted(sd.glob("grace_hopper.jpg"))
    except ImportError:
        pass
    out = []
    for p in candidates:
        try:
            from PIL import Image
            with Image.open(p) as im:
                if im.size[0] >= 256 and im.size[1] >= 256:
                    out.append(p)
        except Exception:
            continue
    return out


class BundledPhotoDataset(DataLoaderInterface):
    """Real photographs bundled with installed packages, as uint8 HWC.

    The closest available stand-in for Kodak when the environment has no
    network access: sklearn's china/flower (640x427 outdoor photos) and
    matplotlib's grace_hopper portrait (512x600). Used by the real-data RD
    validation (parity gate: reference Kodak evaluation in
    configs/lossy_graph_scalable_exp.py).

    align: pad-crop each image so H and W are multiples of this (coding
    pipelines need /64 alignment); uses a centered crop (never pads, the
    bundled photos are larger than any sane alignment).
    """

    def __init__(self, align: int = 1, max_items: Optional[int] = None,
                 crop_size: Optional[int] = None, seed: int = 0):
        self.files = _discover_bundled_photos()
        if max_items is not None:
            self.files = self.files[:max_items]
        self.align = align
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)

    def get_length(self) -> int:
        return len(self.files)

    def get_data_at(self, idx: int) -> np.ndarray:
        from PIL import Image
        img = np.asarray(Image.open(self.files[idx]).convert("RGB"))
        if self.crop_size is not None:
            return random_crop(img, self.crop_size, self.rng)
        if self.align > 1:
            h, w = img.shape[:2]
            ah, aw = (h // self.align) * self.align, (w // self.align) * self.align
            y0, x0 = (h - ah) // 2, (w - aw) // 2
            img = img[y0:y0 + ah, x0:x0 + aw]
        return img

    def iterate(self):
        for i in range(len(self.files)):
            yield self.get_data_at(i)


class BatchedPatchLoader:
    """Training loader: yields NHWC float32 [0,1] batches of random patches.

    TPU idiom: fixed static batch shape, host-side numpy pipeline, contiguous
    arrays handed to jax.device_put by the trainer.
    """

    def __init__(self, dataset: DataLoaderInterface, batch_size: int,
                 patch_size: int, seed: int = 0,
                 steps_per_epoch: Optional[int] = None,
                 augment=None):
        """augment: optional callable (img, np rng) -> img applied per patch
        — e.g. transforms.Compose([random_flip, random_rotate90]) (parity:
        the reference's torchvision augmentation pipeline in its training
        dataset configs)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.rng = np.random.default_rng(seed)
        self.steps_per_epoch = steps_per_epoch or max(
            1, len(dataset) // batch_size)
        self.augment = augment

    def __iter__(self):
        n = len(self.dataset)
        for _ in range(self.steps_per_epoch):
            idxs = self.rng.integers(0, n, self.batch_size)
            patches = []
            for i in idxs:
                p = random_crop(self.dataset.get_data_at(int(i)),
                                self.patch_size, self.rng)
                if self.augment is not None:
                    p = self.augment(p, self.rng)
                patches.append(p)
            yield np.stack(patches).astype(np.float32) / 255.0


class NumpyImageDataset(DataLoaderInterface):
    """Images from an in-memory array or a .npy/.npz file (N, H, W, C).

    Parity: numpy_image_dataset_wrapper
    (reference configs/datasets/images/numpy_image_dataset_wrapper.py over
    cbench/data/datasets/images.py).
    """

    def __init__(self, source, key: Optional[str] = None,
                 max_items: Optional[int] = None):
        if isinstance(source, (str, Path)):
            path = str(source)
            if path.endswith(".npz"):
                with np.load(path) as f:
                    arr = f[key or list(f.keys())[0]]
            else:
                arr = np.load(path)
        else:
            arr = np.asarray(source)
        if arr.ndim == 3:
            arr = arr[None]
        self.array = arr[:max_items] if max_items else arr

    def get_length(self) -> int:
        return len(self.array)

    def get_data_at(self, idx: int) -> np.ndarray:
        img = self.array[idx]
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        return img

    def iterate(self):
        for i in range(len(self.array)):
            yield self.get_data_at(i)


class PILImageDataset(DataLoaderInterface):
    """Explicit list of image file paths (or PIL images) as uint8 HWC.

    Parity: pil_image_dataset_wrapper / image_dataset_wrapper (reference
    configs/datasets/images/).
    """

    def __init__(self, images, max_items: Optional[int] = None):
        self.images = list(images)[:max_items] if max_items else list(images)

    def get_length(self) -> int:
        return len(self.images)

    def get_data_at(self, idx: int) -> np.ndarray:
        item = self.images[idx]
        if isinstance(item, (str, Path)):
            from PIL import Image
            item = Image.open(item)
        if hasattr(item, "convert"):
            item = np.asarray(item.convert("RGB"))
        return np.asarray(item)

    def iterate(self):
        for i in range(len(self.images)):
            yield self.get_data_at(i)
