"""Dataset sub-config: openimages image set (OpenImages train subset).

Parity: reference configs/datasets/images/openimages.py — folder
dataset at the env data path, synthetic fallback when absent."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import (
    ImageFolderDataset,
    SyntheticImageDataset,
)

import env


def _folder_or_synthetic(subdir, num_items, height, width, crop_size=None,
                         max_items=None):
    """Real folder when the data is present; deterministic synthetic
    stand-in with the dataset's geometry otherwise (zero-egress CI)."""
    root = os.path.join(os.path.dirname(env.TEST_DATA_DIR), subdir)
    if os.path.isdir(root) and any(os.scandir(root)):
        return ImageFolderDataset(root, crop_size=crop_size,
                                  max_items=max_items)
    return SyntheticImageDataset(num_items=num_items, height=height,
                                 width=width)


def _build(num_items=64, height=768, width=1024, max_items=None, crop_size=None):
    return _folder_or_synthetic("openimages/train", num_items, height, width,
                                max_items=max_items, crop_size=crop_size)


config = ClassBuilder(
    _build,
    num_items=ParamSlot("num_items", default=64),
    height=ParamSlot("height", default=768),
    width=ParamSlot("width", default=1024),
    max_items=ParamSlot("max_items", default=None),
    crop_size=ParamSlot("crop_size", default=256),
).set_override_name("openimages")
