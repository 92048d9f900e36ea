"""Parallelism strategies beyond the trainer's data-parallel mesh.

Reference inventory (SURVEY.md §2.9): data parallel (DDP) lives in
train/trainer.py as batch sharding over a 'data' mesh axis; this package
holds the other axes of the dp/tp/sp/ep/pp matrix:

- replicated.py — model-list (per-λ replica, the ep analog) parallelism:
  the CUDADeviceParallelNNTrainer counterpart (cbench/nn/trainer.py:
  663-754), stacked-vmap over a ('replica', 'data') mesh.
- spatial.py   — sp: image height sharded over a 'spatial' axis, XLA
  halo exchange (multi-chip 4K inference/training without host tiling).
- pipeline.py  — pp: GPipe microbatch schedule over a 'stage' axis with
  differentiable ppermute rotations (no reference analog; TPU-native).

Tensor parallel (tp) is a sharding layout, not a wrapper: see
__graft_entry__._dryrun_multichip_body phase 3 for the canonical
output-feature-dim conv kernel sharding.
"""

from .pipeline import (
    make_pipeline_mesh,
    make_pipeline_train_step,
    pipeline_apply,
    stack_stage_params,
)
from .replicated import (
    ReplicaParallelTrainer,
    make_replica_mesh,
    stack_params,
    unstack_params,
)
from .spatial import (
    batch_spatial_sharding,
    make_spatial_mesh,
    make_spatial_step,
    spatial_device_put,
)

__all__ = [
    "ReplicaParallelTrainer",
    "make_replica_mesh",
    "stack_params",
    "unstack_params",
    "make_spatial_mesh",
    "make_spatial_step",
    "batch_spatial_sharding",
    "spatial_device_put",
    "make_pipeline_mesh",
    "make_pipeline_train_step",
    "pipeline_apply",
    "stack_stage_params",
]
