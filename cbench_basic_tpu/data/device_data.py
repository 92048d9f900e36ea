"""On-device training data pipeline.

The reference trains through a host-side torch DataLoader feeding CUDA
tensors (reference cbench/data/dataloaders/basic.py + its trainer's
per-batch `.cuda()` copies). On TPU over a network-attached runtime the
equivalent host loop is dispatch/transfer-bound: one jitted step per host
batch costs ~30-60 ms of tunnel latency against ~1 ms of actual compute.

The TPU-native design inverts it: the (small) training image set lives in
HBM once, and patch sampling is a pure traceable function of a PRNG key —
so the whole inner training loop (sample -> loss -> grad -> update) can run
under ONE `lax.scan` dispatch for K steps with zero per-step host traffic.
Used by NeuralCodecTrainer(scan_steps=K) and tools/train_flagship.py.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DevicePatchSampler"]


class DevicePatchSampler:
    """Random-patch batches sampled entirely on device.

    Source images (possibly different sizes) are padded to a common
    (max_h, max_w) canvas and stacked into one float32 [0,1] device array;
    per-image valid crop-offset bounds keep samples inside the real pixels.
    `sample(key)` is traceable: it can be called inside jit / lax.scan.

    Augmentation (matching data/transforms.py's host pipeline, itself parity
    with the reference's torchvision train transforms): random horizontal /
    vertical flips and — for square patches — random 90-degree rotation,
    each an independent coin per patch.

    steps_per_epoch exists so NeuralCodecTrainer can keep the reference's
    epoch accounting (checkpoint / validation cadence) in scan mode.
    """

    @classmethod
    def from_dataset(cls, dataset, patch_size: int, batch_size: int,
                     augment: bool = True,
                     steps_per_epoch: Optional[int] = None,
                     max_images: Optional[int] = None):
        """Materialize a DataLoaderInterface dataset (uint8 HWC images)
        into HBM — the config-system entry point (configs/dataloaders/
        device_patch.py)."""
        images = []
        for im in dataset.iterate():
            images.append(np.asarray(im))
            if max_images is not None and len(images) >= max_images:
                break
        return cls(images, patch_size, batch_size, augment=augment,
                   steps_per_epoch=steps_per_epoch)

    def __init__(self, images: Sequence[np.ndarray], patch_size: int,
                 batch_size: int, augment: bool = True,
                 steps_per_epoch: Optional[int] = None,
                 color_permute: bool = False):
        if not images:
            raise ValueError("DevicePatchSampler needs at least one image")
        self.patch_size = int(patch_size)
        self.batch_size = int(batch_size)
        self.augment = bool(augment)
        # RGB channel permutation: a cheap label-free augmentation that
        # multiplies color diversity 6x without changing image structure —
        # useful when the training set is a handful of photos (the codec
        # has no color semantics to preserve, unlike a classifier).
        self.color_permute = bool(color_permute)
        self._perms = jnp.asarray(
            [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
            jnp.int32)
        self.steps_per_epoch = int(steps_per_epoch or 1000)

        max_h = max(im.shape[0] for im in images)
        max_w = max(im.shape[1] for im in images)
        if min(im.shape[0] for im in images) < patch_size or \
           min(im.shape[1] for im in images) < patch_size:
            raise ValueError("every image must be at least patch_size")
        # uint8 canvas: 4x less HBM than float32 and — just as important —
        # 4x smaller as a program operand; patches convert to float32 AFTER
        # the dynamic_slice (batch*patch^2 values instead of the whole bank).
        canvas = np.zeros((len(images), max_h, max_w, 3), np.uint8)
        bounds = np.zeros((len(images), 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            arr = np.asarray(im)
            if arr.dtype != np.uint8:  # accept float [0,1] sources too
                arr = np.clip(np.asarray(arr, np.float32) * 255.0 + 0.5,
                              0, 255).astype(np.uint8)
            canvas[i, :h, :w] = arr
            bounds[i] = (h - patch_size + 1, w - patch_size + 1)
        self.images = jnp.asarray(canvas)
        self.bounds = jnp.asarray(bounds)

    @property
    def bank(self):
        """Device arrays to thread through jit as ARGUMENTS. A jitted
        function that closes over `self.images` embeds the whole bank as an
        HLO constant — for a big training set that inflates the program
        (remote-compile services reject it: observed HTTP 413 at ~600 MB of
        constants) and duplicates HBM. Pass `sampler.bank` in and call
        `sample_from(bank, key)` instead (NeuralCodecTrainer's scan loop
        does this)."""
        return (self.images, self.bounds)

    @property
    def batch_shape(self):
        return (self.batch_size, self.patch_size, self.patch_size, 3)

    def _one(self, images, bounds, key):
        """One random (augmented) patch: traceable, vmapped over the batch."""
        k_img, k_y, k_x, k_f, k_c = jax.random.split(key, 5)
        idx = jax.random.randint(k_img, (), 0, images.shape[0])
        by, bx = bounds[idx, 0], bounds[idx, 1]
        # Uniform offset in [0, bound): bounds differ per image, so draw
        # U[0,1) and scale — randint's maxval must be trace-constant.
        oy = (jax.random.uniform(k_y) * by.astype(jnp.float32)).astype(jnp.int32)
        ox = (jax.random.uniform(k_x) * bx.astype(jnp.float32)).astype(jnp.int32)
        p = jax.lax.dynamic_slice(
            images[idx], (oy, ox, 0),
            (self.patch_size, self.patch_size, 3))
        p = p.astype(jnp.float32) / 255.0
        if self.augment:
            f = jax.random.bernoulli(k_f, shape=(3,))
            p = jnp.where(f[0], p[::-1], p)
            p = jnp.where(f[1], p[:, ::-1], p)
            # 90-degree rotation == transpose of a flipped square patch.
            p = jnp.where(f[2], jnp.transpose(p, (1, 0, 2)), p)
        if self.color_permute:
            perm = self._perms[jax.random.randint(k_c, (), 0, 6)]
            p = jnp.take(p, perm, axis=-1)
        return p

    def sample_from(self, bank, key):
        """(batch, patch, patch, 3) float32 [0,1] — pure function of
        (bank, key), where `bank` is the `.bank` tuple threaded through the
        caller's jit as an argument (no HLO-constant embedding)."""
        images, bounds = bank
        keys = jax.random.split(key, self.batch_size)
        return jax.vmap(lambda k: self._one(images, bounds, k))(keys)

    def sample(self, key):
        """(batch, patch, patch, 3) float32 [0,1] — pure function of `key`.
        Convenience form that closes over the bank; inside jit the bank
        becomes a program constant, so prefer sample_from(bank, key) for
        large training sets."""
        return self.sample_from(self.bank, key)

    def __iter__(self):
        """Host-iterable fallback so the sampler can also drive the classic
        per-batch trainer loop and `init_params`' shape probe."""
        key = jax.random.PRNGKey(0)
        for i in range(self.steps_per_epoch):
            yield np.asarray(self.sample(jax.random.fold_in(key, i)))
