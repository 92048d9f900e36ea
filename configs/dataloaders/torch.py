"""Dataloader sub-config: torch DataLoader with multiprocess prefetch.

Parity: reference configs/dataloaders/torch.py over PyTorchDataLoader
(batch_size/shuffle/num_workers/persistent_workers slots; CPU torch)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.dataloaders import TorchDataLoader

_CPUS = max(0, (os.cpu_count() or 1) - 1)

config = ClassBuilder(
    TorchDataLoader,
    dataset=ParamSlot("dataset"),
    batch_size=ParamSlot("batch_size", default=1),
    shuffle=ParamSlot("shuffle", default=True),
    num_workers=ParamSlot("num_workers", default=_CPUS),
    persistent_workers=ParamSlot("persistent_workers", default=_CPUS > 0),
).set_override_name("torch_loader")
