"""Sub-config: ImageNet subset-8000 training set (reference
presets/common_trainer.py:18-56); synthetic fallback when absent."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import ImageFolderDataset, SyntheticImageDataset

import env

if os.path.isdir(env.TRAIN_DATA_DIR):
    config = ClassBuilder(ImageFolderDataset, env.TRAIN_DATA_DIR)
else:
    config = ClassBuilder(SyntheticImageDataset,
                          num_items=ParamSlot("num_items", default=64),
                          height=256, width=256)
config = config.set_override_name("imagenet_subset")
