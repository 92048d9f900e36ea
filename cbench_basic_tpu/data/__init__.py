from .datasets import (  # noqa: F401
    BatchedPatchLoader,
    BundledPhotoDataset,
    DataLoaderInterface,
    ImageFolderDataset,
    SyntheticImageDataset,
)
from .device_data import DevicePatchSampler  # noqa: F401
from .transforms import (  # noqa: F401
    Compose,
    aligned_crop,
    aligned_pad,
    color_jitter,
    random_crop,
    random_flip,
    random_rotate90,
)
