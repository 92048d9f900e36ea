"""nnmodules trainer sub-config: model-list parallel trainer — per-λ
replicas stacked and vmapped over a (replica, data) device mesh. The
TPU-era answer to CUDADeviceParallelNNTrainer's one-model-per-GPU loop:
XLA shards replicas over the mesh instead of CUDA device pinning.

Parity: reference configs/nnmodules/trainer/
cuda_device_parallel_trainer.py (parallel/replicated.py here)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.parallel.replicated import ReplicaParallelTrainer

config = ClassBuilder(
    ReplicaParallelTrainer,
    dataloader=ParamSlot("dataloader", default=None),
    num_epochs=ParamSlot("num_epochs", default=1),
).add_all_kwargs_as_param_slot().set_override_name(
    "device_parallel_trainer")
