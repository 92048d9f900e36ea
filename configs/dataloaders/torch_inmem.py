"""Dataloader sub-config: in-process torch loader (num_workers=0).

Parity: reference configs/dataloaders/torch_inmem.py (the torch config
with workers disabled — in-memory datasets need no prefetch procs)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.dataloaders import TorchDataLoader

config = ClassBuilder(
    TorchDataLoader,
    dataset=ParamSlot("dataset"),
    batch_size=ParamSlot("batch_size", default=1),
    shuffle=ParamSlot("shuffle", default=True),
    num_workers=ParamSlot("num_workers", default=0),
).set_override_name("torch_inmem_loader")
