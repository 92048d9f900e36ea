"""Synthetic training-data generators (data/synthetic.py).

The zero-egress stand-in for the reference's ImageNet subset
(reference configs/lossy_graph_scalable_exp.py dataset wiring): natural-
image-statistics imagery whose palettes come from the bundled photos.
Round 4 adds textured dead-leaves and real-photo collages; these tests pin
the output contract (uint8 HWC, full coverage) and the legacy-mix RNG
reproducibility the bundled checkpoints depend on.
"""

import numpy as np
import pytest

from cbench_basic_tpu.data.synthetic import (
    colored_noise_image,
    dead_leaves_image,
    gradient_field_image,
    photo_collage_image,
    synthetic_training_images,
    textured_leaves_image,
)


@pytest.fixture(scope="module")
def photos():
    rng = np.random.default_rng(42)
    # smooth-ish fake "photos" (random low-freq fields) as palette sources
    out = []
    for _ in range(2):
        base = rng.uniform(0, 255, (12, 16, 3))
        img = np.kron(base, np.ones((16, 16, 1)))[:180, :240]
        out.append(img.astype(np.uint8))
    return out


@pytest.mark.parametrize("gen", [dead_leaves_image, textured_leaves_image,
                                 colored_noise_image, gradient_field_image])
def test_generators_output_contract(gen, photos):
    rng = np.random.default_rng(0)
    pal = photos[0].reshape(-1, 3)
    img = gen(96, rng, palette=pal)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    # covered canvas with non-trivial content
    assert img.std() > 1.0


def test_photo_collage_covers_canvas(photos):
    rng = np.random.default_rng(1)
    img = photo_collage_image(128, rng, photos)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # collage pixels come from the sources: every value present in a source
    # (nearest-neighbor zoom + rot90/flip never invent new values)
    src_vals = np.union1d(np.unique(photos[0]), np.unique(photos[1]))
    assert np.isin(np.unique(img), src_vals).all()
    with pytest.raises(ValueError):
        photo_collage_image(64, rng, [])


def test_textured_leaves_adds_interior_detail():
    """Texture modulation raises high-frequency energy INSIDE objects:
    compare laplacian energy off the plain dead-leaves rendering."""
    img_plain = dead_leaves_image(128, np.random.default_rng(3),
                                  noise_std=0.0)
    img_tex = textured_leaves_image(128, np.random.default_rng(3),
                                    noise_std=0.0,
                                    texture_contrast=(0.12, 0.15))

    def lap_energy(im):
        g = im.astype(np.float64).mean(-1)
        return np.abs(np.diff(g, axis=0)).mean() + \
            np.abs(np.diff(g, axis=1)).mean()

    assert lap_energy(img_tex) > lap_energy(img_plain)


def test_mix_legacy_reproducibility(photos):
    """The 3-way default must reproduce the exact stream the bundled vr4
    checkpoint trained on; inserting zero-weight classes keeps the
    choice() cumsum boundaries so the kinds AND the per-image RNG draws
    match the padded 5-way mix with zeroed new classes."""
    a = synthetic_training_images(6, size=64, seed=9, photos=photos)
    b = synthetic_training_images(6, size=64, seed=9, photos=photos,
                                  mix=(0.6, 0.0, 0.25, 0.15, 0.0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_mix_five_way(photos):
    imgs = synthetic_training_images(
        8, size=64, seed=5, photos=photos,
        mix=(0.3, 0.25, 0.15, 0.1, 0.2))
    assert len(imgs) == 8
    assert all(im.shape == (64, 64, 3) and im.dtype == np.uint8
               for im in imgs)
    # no photos -> collage weight folds into dead-leaves instead of failing
    imgs = synthetic_training_images(
        4, size=64, seed=5, photos=None,
        mix=(0.3, 0.25, 0.15, 0.1, 0.2))
    assert len(imgs) == 4
    with pytest.raises(ValueError):
        synthetic_training_images(2, size=64, seed=0, mix=(1.0, 1.0))
