"""Dataset sub-config: PIL image list wrapper (paths or PIL.Image objects).

Parity: reference configs/datasets/images/pil_image_dataset_wrapper.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import PILImageDataset

config = ClassBuilder(
    PILImageDataset,
    images=ParamSlot("images", default=()),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("pil_image_dataset_wrapper")
