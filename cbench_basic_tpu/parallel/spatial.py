"""Spatial partitioning (sp) of image-codec steps over a device mesh.

The reference framework reaches large inputs by host-side tiling
(cbench/codecs/binary_codec.py subprocess tiling; our codecs/tiled.py).
The TPU-native axis is XLA SPMD *spatial partitioning*: shard the image's
height dim over a 'spatial' mesh axis and jit the whole forward/train
step — XLA inserts the conv halo exchanges (collective-permutes of the
kernel-overlap rows) automatically, so one 4K image can span several
chips' HBM with no tiling seams and no host round trips. Composes with
the 'data' axis (dp x sp meshes).

Used by __graft_entry__._dryrun_multichip_body (sp phase) and available
to the tiled/4K inference path as the multi-chip alternative to host
tiling.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(n_data: int, n_spatial: int,
                      devices: Optional[Sequence] = None) -> Mesh:
    """(data, spatial) mesh: batch shards over 'data', image height over
    'spatial'."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(f"need {need} devices, got {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_data, n_spatial),
                axis_names=("data", "spatial"))


def batch_spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding: N over 'data', H over 'spatial'. H must be a
    multiple of mesh.shape['spatial'] * the model's total stride for the
    halo exchange to stay aligned (aligned_pad provides this)."""
    return NamedSharding(mesh, P("data", "spatial", None, None))


def make_spatial_step(step_fn: Callable, mesh: Mesh,
                      n_state_args: int = 2):
    """Jit ``step_fn(*state, batch, rng)`` with the batch spatially
    sharded and everything else replicated. ``n_state_args`` leading
    arguments (params, opt_state, ...) are replicated; outputs are
    replicated (losses/metrics/updated state are dense pytrees).

    XLA partitions every conv in the traced step across 'spatial' with
    halo exchange; gradients of the halo regions ride the reverse
    collective-permutes, so this is a full sp TRAINING step, not just
    inference."""
    repl = NamedSharding(mesh, P())
    batch_sh = batch_spatial_sharding(mesh)
    in_sh = tuple([repl] * n_state_args + [batch_sh, repl])
    return jax.jit(step_fn, in_shardings=in_sh)


def spatial_device_put(batch: Any, mesh: Mesh):
    return jax.device_put(batch, batch_spatial_sharding(mesh))
