from .datasets import DataLoaderInterface, ImageFolderDataset, SyntheticImageDataset  # noqa: F401
from .transforms import aligned_crop, aligned_pad, random_crop  # noqa: F401
