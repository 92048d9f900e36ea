"""Synthetic natural-image-statistics training data.

The reference trains its published models on an ImageNet subset
(reference configs/lossy_graph_scalable_exp.py dataset wiring:
subset_8000). This zero-egress environment bundles only three real
photographs, so a codec trained on them alone overfits its entropy
model: the round-3 flagship measured 0.53 bpp on train patches vs 1.05
bpp held-out. The classic remedy when photos are scarce is synthetic
imagery whose *statistics* match natural images:

- **Dead leaves**: occluding disks with a power-law radius distribution
  reproduce natural images' scale invariance, 1/f^2 power spectrum, and
  occlusion edges (Ruderman 1997; Lee, Mumford & Huang IJCV 2001). Used
  as-is as training data for low-level vision (Achddou et al. 2021,
  "Image denoising with deep CNNs from synthetic data").
- **1/f^alpha colored noise**: matches the amplitude spectrum without
  edge structure — regularizes the entropy bottleneck's tail behavior.
- **Smooth gradients + soft shadows**: low-rate content (sky-like) that
  keeps the hyperprior's low-entropy modes exercised.

Palette: disk/field colors are drawn from the *bundled real photos'*
pixel distribution when available, so the synthetic marginals match the
deployment data; falls back to uniform RGB otherwise.

Everything is plain numpy on the host — images are generated once at
startup and live in HBM via DevicePatchSampler for the scanned training
loop (device_data.py).
"""
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "dead_leaves_image",
    "textured_leaves_image",
    "colored_noise_image",
    "gradient_field_image",
    "photo_collage_image",
    "synthetic_training_images",
]


def _sample_palette(rng: np.random.Generator, n: int,
                    palette: Optional[np.ndarray]) -> np.ndarray:
    """(n,3) float colors in [0,1], from real-photo pixels when given."""
    if palette is not None and len(palette):
        idx = rng.integers(0, len(palette), n)
        base = palette[idx].astype(np.float32) / 255.0
        # small jitter so the color histogram is not a comb
        return np.clip(base + rng.normal(0, 0.02, (n, 3)), 0.0, 1.0)
    return rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)


def dead_leaves_image(size: int, rng: np.random.Generator,
                      palette: Optional[np.ndarray] = None,
                      rmin: float = 2.0, rmax: Optional[float] = None,
                      alpha: float = 3.0, max_disks: int = 8000,
                      noise_std: float = 0.015,
                      supersample: int = 2) -> np.ndarray:
    """One dead-leaves image, uint8 HWC.

    Disks are drawn FRONT to BACK into the not-yet-covered region (the
    occlusion-equivalent of back-to-front painting, but it terminates as
    soon as the canvas is covered). Radii follow p(r) ~ r^-alpha on
    [rmin, rmax] — alpha=3 is the scale-invariant exponent. Rendering at
    `supersample`x and area-downsampling anti-aliases the disk edges so
    they behave like real (slightly blurred by optics) object contours
    rather than binary masks.
    """
    s = size * supersample
    rmax_eff = (rmax if rmax is not None else size / 3.0) * supersample
    rmin_eff = rmin * supersample
    img = np.zeros((s, s, 3), np.float32)
    covered = np.zeros((s, s), bool)
    # inverse-CDF sampling of p(r) ~ r^-alpha on [rmin, rmax]
    u = rng.uniform(0.0, 1.0, max_disks)
    a1 = 1.0 - alpha
    radii = (rmin_eff ** a1 + u * (rmax_eff ** a1 - rmin_eff ** a1)) ** (1.0 / a1)
    centers = rng.uniform(0, s, (max_disks, 2)).astype(np.float32)
    colors = _sample_palette(rng, max_disks, palette)
    yy = np.arange(s, dtype=np.float32)
    for i in range(max_disks):
        r = float(radii[i])
        cy, cx = centers[i]
        y0, y1 = max(0, int(cy - r) - 1), min(s, int(cy + r) + 2)
        x0, x1 = max(0, int(cx - r) - 1), min(s, int(cx + r) + 2)
        if y0 >= y1 or x0 >= x1:
            continue
        dy = yy[y0:y1, None] - cy
        dx = yy[None, x0:x1] - cx
        disk = (dy * dy + dx * dx) <= r * r
        new = disk & ~covered[y0:y1, x0:x1]
        if new.any():
            img[y0:y1, x0:x1][new] = colors[i]
            covered[y0:y1, x0:x1] |= disk
            if i % 64 == 0 and covered.all():
                break
    if not covered.all():
        img[~covered] = colors[-1]
    # area downsample (anti-alias) back to `size`
    if supersample > 1:
        img = img.reshape(size, supersample, size, supersample, 3).mean((1, 3))
    if noise_std:
        img = img + rng.normal(0.0, noise_std, img.shape).astype(np.float32)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def _noise_field(size: int, rng: np.random.Generator,
                 alpha: float = 1.0) -> np.ndarray:
    """(size, size) zero-mean unit-std 1/f^alpha field."""
    f = np.fft.fftfreq(size)
    fy, fx = np.meshgrid(f, f, indexing="ij")
    mag = np.hypot(fy, fx)
    mag[0, 0] = 1.0
    filt = mag ** (-alpha)
    filt[0, 0] = 0.0
    spec = (rng.normal(size=(size, size))
            + 1j * rng.normal(size=(size, size))) * filt
    x = np.fft.ifft2(spec).real
    sd = x.std()
    return (x / (sd if sd > 0 else 1.0)).astype(np.float32)


def textured_leaves_image(size: int, rng: np.random.Generator,
                          palette: Optional[np.ndarray] = None,
                          texture_contrast=(0.03, 0.15),
                          **leaves_kwargs) -> np.ndarray:
    """Dead leaves whose flat disks are modulated by shared 1/f texture.

    Plain dead leaves capture occlusion geometry but every object is
    piecewise-constant, so a codec trained on them under-allocates rate to
    mid-frequency object-interior detail (wood grain, fabric, foliage) —
    exactly what real photos are full of. Multiplicatively modulating the
    leaves image with a luma 1/f field (plus a weaker chroma field) puts
    natural-spectrum texture INSIDE the occluding objects while keeping
    the edges, giving the 1/f^2 spectrum both from edges and from texture
    (Lee, Mumford & Huang IJCV 2001 make the same composition argument)."""
    base = dead_leaves_image(size, rng, palette, **leaves_kwargs)
    img = base.astype(np.float32) / 255.0
    c_luma = rng.uniform(*texture_contrast)
    luma = _noise_field(size, rng, alpha=rng.uniform(0.8, 1.2))
    img = img * (1.0 + c_luma * luma)[..., None]
    # weaker independent chroma wobble on one random channel pair
    c_chroma = 0.4 * c_luma
    ch = rng.integers(0, 3)
    img[..., ch] = img[..., ch] * (1.0 + c_chroma * _noise_field(
        size, rng, alpha=1.0))
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def photo_collage_image(size: int, rng: np.random.Generator,
                        photos: Sequence[np.ndarray],
                        n_patches=(6, 18)) -> np.ndarray:
    """Occluding collage of REAL photo crops at random scales/orientations.

    The strongest augmentation available in a zero-egress environment:
    actual natural pixels (the train split only — callers pass the
    already-holdout-excluded list), re-seen at new scales (0.5x-2x
    zoom), 90-degree orientations, and flips, composited with occlusion
    like dead leaves. Multiplies the effective pixel diversity of a
    handful of photos without inventing any non-natural statistics."""
    if not photos:
        raise ValueError("photo_collage_image needs source photos")
    canvas = np.zeros((size, size, 3), np.float32)
    covered = np.zeros((size, size), bool)
    n = int(rng.integers(*n_patches))
    for _ in range(n):
        src = photos[int(rng.integers(0, len(photos)))]
        h, w = src.shape[:2]
        # crop size in SOURCE pixels; zoom in [0.5, 2] when pasted
        zoom = float(rng.uniform(0.5, 2.0))
        out_s = int(rng.uniform(0.25, 0.8) * size)
        src_s = max(8, min(int(out_s / zoom), h, w))
        out_s = int(src_s * zoom)
        if out_s < 8 or out_s > size:
            continue
        y0 = int(rng.integers(0, h - src_s + 1))
        x0 = int(rng.integers(0, w - src_s + 1))
        crop = src[y0:y0 + src_s, x0:x0 + src_s].astype(np.float32)
        # nearest-neighbor zoom via index maps (no scipy in the hot set)
        idx = np.clip((np.arange(out_s) / zoom).astype(np.int64), 0,
                      src_s - 1)
        crop = crop[idx][:, idx]
        k = int(rng.integers(0, 4))
        if k:
            crop = np.rot90(crop, k)
        if rng.uniform() < 0.5:
            crop = crop[:, ::-1]
        py = int(rng.integers(0, size - out_s + 1))
        px = int(rng.integers(0, size - out_s + 1))
        region_cov = covered[py:py + out_s, px:px + out_s]
        new = ~region_cov
        canvas[py:py + out_s, px:px + out_s][new] = crop[new]
        covered[py:py + out_s, px:px + out_s] = True
        if covered.all():
            break
    if not covered.all():
        # fill leftovers with one more big crop (wrap-padded if needed)
        src = photos[int(rng.integers(0, len(photos)))]
        h, w = src.shape[:2]
        s = min(h, w, size)
        y0 = int(rng.integers(0, h - s + 1))
        x0 = int(rng.integers(0, w - s + 1))
        fill = src[y0:y0 + s, x0:x0 + s].astype(np.float32)
        if s < size:
            reps = -(-size // s)
            fill = np.tile(fill, (reps, reps, 1))[:size, :size]
        canvas[~covered] = fill[~covered]
    return (np.clip(canvas, 0.0, 255.0) + 0.5).astype(np.uint8)


def colored_noise_image(size: int, rng: np.random.Generator,
                        alpha: float = 1.0,
                        palette: Optional[np.ndarray] = None) -> np.ndarray:
    """1/f^alpha noise with a random mean color, uint8 HWC.

    alpha=1 gives the natural-image amplitude spectrum (power ~ 1/f^2).
    Channels share one spatial field plus small independent residuals so
    the RGB correlation resembles photographs (luma-dominant).
    """
    def field():
        return _noise_field(size, rng, alpha=alpha)

    shared = field()
    base = _sample_palette(rng, 1, palette)[0]
    contrast = rng.uniform(0.08, 0.25)
    img = np.stack([base[c] + contrast * (shared + 0.3 * field())
                    for c in range(3)], axis=-1)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def gradient_field_image(size: int, rng: np.random.Generator,
                         palette: Optional[np.ndarray] = None,
                         n_blobs: int = 6) -> np.ndarray:
    """Smooth multi-blob gradient (sky-like low-rate content), uint8 HWC."""
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    cols = _sample_palette(rng, n_blobs + 1, palette)
    img = np.ones((size, size, 3), np.float32) * cols[0]
    for i in range(n_blobs):
        cy, cx = rng.uniform(0, 1, 2)
        sig = rng.uniform(0.15, 0.6)
        w = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig * sig))
        img = img * (1 - w[..., None]) + cols[i + 1] * w[..., None]
    img += rng.normal(0, 0.01, img.shape).astype(np.float32)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def synthetic_training_images(count: int, size: int = 512, seed: int = 0,
                              photos: Optional[Sequence[np.ndarray]] = None,
                              mix=(0.6, 0.25, 0.15)) -> list:
    """`count` synthetic uint8 images: dead-leaves / 1/f noise / gradients
    in `mix` proportions, palettes sampled from `photos` when provided.

    A 5-way `mix` unlocks the round-4 generators: (plain dead-leaves,
    textured dead-leaves, 1/f noise, gradients, real-photo collage); the
    collage weight is folded into dead-leaves when no photos are given.
    The legacy 3-way mix stays the default so earlier training recipes
    reproduce exactly (the bundled vr4 checkpoint trained on it)."""
    rng = np.random.default_rng(seed)
    palette = None
    if photos:
        pix = [np.asarray(p).reshape(-1, 3) for p in photos]
        pix = np.concatenate(pix, 0)
        palette = pix[rng.integers(0, len(pix), min(len(pix), 65536))]
    if len(mix) == 3:
        weights = [mix[0], 0.0, mix[1], mix[2], 0.0]
    elif len(mix) == 5:
        weights = list(mix)
    else:
        raise ValueError("mix must have 3 (legacy) or 5 entries")
    if not photos:
        weights[0] += weights[4]
        weights[4] = 0.0
    kinds = rng.choice(5, size=count, p=np.asarray(weights, float)
                       / np.sum(weights))
    out = []
    for i in range(count):
        k = int(kinds[i])
        if k == 0:
            out.append(dead_leaves_image(size, rng, palette))
        elif k == 1:
            out.append(textured_leaves_image(size, rng, palette))
        elif k == 2:
            out.append(colored_noise_image(
                size, rng, alpha=float(rng.uniform(0.8, 1.3)),
                palette=palette))
        elif k == 3:
            out.append(gradient_field_image(size, rng, palette))
        else:
            out.append(photo_collage_image(size, rng, photos))
    return out
