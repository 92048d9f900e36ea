"""Dataset sub-config: webdataset-style tar shards.

Parity: reference configs/datasets/webdataset/base.py (wds.WebDataset over
shard urls) — here the stdlib-tarfile TarShardDataset
(data/extra_datasets.py), no extra dependency.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.extra_datasets import TarShardDataset

config = ClassBuilder(
    TarShardDataset,
    urls=ParamSlot("urls", default="data/shards/*.tar"),
    decode_images=ParamSlot("decode_images", default=False),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("webdataset")
