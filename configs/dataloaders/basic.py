"""Dataloader sub-config: sequential per-sample loader with max_samples.

Parity: reference configs/dataloaders/basic.py over BasicDataLoader."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.dataloaders import BasicDataLoader

config = ClassBuilder(
    BasicDataLoader,
    dataset=ParamSlot("dataset"),
    max_samples=ParamSlot("max_samples", default=None),
).set_override_name("basic_loader")
