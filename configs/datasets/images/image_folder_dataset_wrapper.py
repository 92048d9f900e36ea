"""Dataset sub-config: generic image-folder dataset wrapper.

Parity: reference configs/datasets/images/image_folder_dataset_wrapper.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import ImageFolderDataset

config = ClassBuilder(
    ImageFolderDataset,
    root=ParamSlot("root", default='data/images'),
    crop_size=ParamSlot("crop_size", default=None),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("image_folder_dataset_wrapper")
