"""Sub-config: Kodak test set (folder dataset; synthetic fallback when the
directory is absent — zero-egress environments)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import ImageFolderDataset, SyntheticImageDataset

import env

if os.path.isdir(env.TEST_DATA_DIR):
    config = ClassBuilder(ImageFolderDataset, env.TEST_DATA_DIR)
else:
    # Smoke knobs shrink the synthetic stand-in (zero-egress environments).
    config = ClassBuilder(
        SyntheticImageDataset,
        num_items=ParamSlot(
            "num_items", default=int(os.environ.get("CBENCH_TEST_ITEMS", 4))),
        height=int(os.environ.get("CBENCH_TEST_H", 512)),
        width=int(os.environ.get("CBENCH_TEST_W", 768)))
config = config.set_override_name("kodak")
