"""Dataset sub-config: paired detection samples (image + annotations dict).

Parity: reference configs/datasets/detectron2/detection_paired.py — the
compress-then-detect task axis consumes (image, boxes, labels) pairs; this
wraps any image dataset object into that contract.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import SyntheticImageDataset
from cbench_basic_tpu.data.extra_datasets import DetectionDataset


def _build(image_dataset=None, annotations=None, num_random_boxes=3,
           num_classes=8, seed=0):
    if image_dataset is None:
        image_dataset = SyntheticImageDataset(num_items=8, height=256,
                                              width=384)
    return DetectionDataset(image_dataset, annotations=annotations,
                            num_random_boxes=num_random_boxes,
                            num_classes=num_classes, seed=seed)


config = ClassBuilder(
    _build,
    image_dataset=ParamSlot("image_dataset", default=None),
    annotations=ParamSlot("annotations", default=None),
    num_random_boxes=ParamSlot("num_random_boxes", default=3),
    num_classes=ParamSlot("num_classes", default=8),
    seed=ParamSlot("seed", default=0),
).set_override_name("detection_paired")
