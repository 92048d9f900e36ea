from .datasets import (  # noqa: F401
    BatchedPatchLoader,
    BundledPhotoDataset,
    DataLoaderInterface,
    ImageFolderDataset,
    SyntheticImageDataset,
)
from .device_data import DevicePatchSampler  # noqa: F401
from .synthetic import (  # noqa: F401
    colored_noise_image,
    dead_leaves_image,
    gradient_field_image,
    synthetic_training_images,
)
from .transforms import (  # noqa: F401
    Compose,
    aligned_crop,
    aligned_pad,
    color_jitter,
    random_crop,
    random_flip,
    random_rotate90,
)
