from .datasets import (  # noqa: F401
    BatchedPatchLoader,
    BundledPhotoDataset,
    DataLoaderInterface,
    ImageFolderDataset,
    SyntheticImageDataset,
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
