"""Dataset sub-config: named detection dataset (COCO-style).

Parity: reference configs/datasets/detectron2/builtin.py (detectron2
builtin registry) — framework-free DetectionDataset over an image folder
plus optional COCO JSON annotations; procedural boxes when absent.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import (
    ImageFolderDataset,
    SyntheticImageDataset,
)
from cbench_basic_tpu.data.extra_datasets import DetectionDataset


def _build(root="data/coco/val2017", annotations=None, num_items=8,
           num_classes=8):
    if os.path.isdir(root):
        images = ImageFolderDataset(root)
    else:
        images = SyntheticImageDataset(num_items=num_items, height=256,
                                       width=384)
    return DetectionDataset(images, annotations=annotations,
                            num_classes=num_classes)


config = ClassBuilder(
    _build,
    root=ParamSlot("root", default="data/coco/val2017"),
    annotations=ParamSlot("annotations", default=None),
    num_items=ParamSlot("num_items", default=8),
    num_classes=ParamSlot("num_classes", default=8),
).set_override_name("detection_builtin")
