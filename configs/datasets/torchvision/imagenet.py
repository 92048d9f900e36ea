"""Dataset sub-config: torchvision imagenet (ImageNet train).

Parity: reference configs/datasets/torchvision/imagenet.py. torchvision is
not in this image; when imagenet/train data is present under the env data path it
is loaded directly (.npz stack or image folder), else a geometry-matched synthetic stand-in
keeps the experiment runnable (zero-egress).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import (
    ImageFolderDataset,
    NumpyImageDataset,
    SyntheticImageDataset,
)

import env


def _build(num_items=64, max_items=None):
    root = os.path.join(os.path.dirname(env.TEST_DATA_DIR), "imagenet/train")
    npz = root + ".npz"
    if os.path.isfile(npz):
        return NumpyImageDataset(npz, max_items=max_items)
    if os.path.isdir(root) and any(os.scandir(root)):
        return ImageFolderDataset(root, max_items=max_items)
    return SyntheticImageDataset(num_items=num_items, height=384,
                                 width=512, channels=3)


config = ClassBuilder(
    _build,
    num_items=ParamSlot("num_items", default=64),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("tv_imagenet")
