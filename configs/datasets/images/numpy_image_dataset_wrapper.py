"""Dataset sub-config: numpy array / .npy / .npz image stack wrapper.

Parity: reference configs/datasets/images/numpy_image_dataset_wrapper.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import NumpyImageDataset

config = ClassBuilder(
    NumpyImageDataset,
    source=ParamSlot("source", default=()),
    key=ParamSlot("key", default=None),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("numpy_image_dataset_wrapper")
