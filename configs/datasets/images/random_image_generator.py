"""Dataset sub-config: procedural random image generator (smooth fields + noise).

Parity: reference configs/datasets/images/random_image_generator.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import SyntheticImageDataset

config = ClassBuilder(
    SyntheticImageDataset,
    num_items=ParamSlot("num_items", default=16),
    height=ParamSlot("height", default=256),
    width=ParamSlot("width", default=256),
    seed=ParamSlot("seed", default=0),
).set_override_name("random_image_generator")
