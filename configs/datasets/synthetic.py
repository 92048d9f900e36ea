"""Sub-config: synthetic image dataset (air-gapped fallback)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import SyntheticImageDataset

config = ClassBuilder(
    SyntheticImageDataset,
    num_items=ParamSlot("num_items", default=64),
    height=ParamSlot("height", default=256),
    width=ParamSlot("width", default=256),
).set_override_name("synthetic")
