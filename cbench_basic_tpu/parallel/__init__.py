"""Parallelism strategies beyond the trainer's data-parallel mesh.

Reference inventory (SURVEY.md §2.9): data parallel (DDP) lives in
train/trainer.py as batch sharding over a 'data' mesh axis; this package
holds model-list (per-λ replica) parallelism — the analog of
CUDADeviceParallelNNTrainer (cbench/nn/trainer.py:663-754).
"""

from .replicated import (
    ReplicaParallelTrainer,
    make_replica_mesh,
    stack_params,
    unstack_params,
)

__all__ = [
    "ReplicaParallelTrainer",
    "make_replica_mesh",
    "stack_params",
    "unstack_params",
]
