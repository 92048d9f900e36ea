"""Dataloader sub-config: deterministic detection-batch loader (eval).

Parity: reference configs/dataloaders/detectron2/detection_test.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.dataloaders import DetectionBatchLoader

config = ClassBuilder(
    DetectionBatchLoader,
    dataset=ParamSlot("dataset"),
    batch_size=ParamSlot("batch_size", default=1),
    shuffle=ParamSlot("shuffle", default=False),
).set_override_name("detection_test_loader")
