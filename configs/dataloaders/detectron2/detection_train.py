"""Dataloader sub-config: shuffled detection-batch loader (training).

Parity: reference configs/dataloaders/detectron2/detection_train.py —
framework-free DetectionBatchLoader, shuffle on."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.dataloaders import DetectionBatchLoader

config = ClassBuilder(
    DetectionBatchLoader,
    dataset=ParamSlot("dataset"),
    batch_size=ParamSlot("batch_size", default=2),
    shuffle=ParamSlot("shuffle", default=True),
    seed=ParamSlot("seed", default=0),
).set_override_name("detection_train_loader")
