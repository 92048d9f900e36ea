"""Spatial autoregression offset helpers.

Behavioral parity with reference cbench/utils/ar_utils.py:4-41: given a data
shape (batch first) and per-dimension negative offsets, produce per-element
flat pointer offsets into the flattened array; 0 marks elements whose AR
neighbor would fall outside the array.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def create_ar_offsets(shape: Sequence[int], ar_dim_offsets: List[List[int]]) -> np.ndarray:
    """Returns int32 array of shape (order, *shape).

    Each order-k plane holds the flat-element distance to the AR neighbor
    defined by ``ar_dim_offsets[k]`` (non-positive per-dim offsets, batch dim
    excluded), or 0 where that neighbor is out of bounds.
    """
    shape = tuple(shape)
    strides = np.zeros(len(shape), dtype=np.int64)
    strides[-1] = 1
    for d in range(len(shape) - 2, -1, -1):
        strides[d] = strides[d + 1] * shape[d + 1]

    planes = []
    for dim_offsets in ar_dim_offsets:
        plane = -np.ones(shape, dtype=np.int32)
        flat_dist = 0
        for j, off in enumerate(dim_offsets):
            if off > 0:
                raise ValueError("ar offsets must be non-positive")
            axis = j + 1  # skip batch dim
            flat_dist += -off * strides[axis]
            if off < 0:
                # Mark the first |off| slices along this axis as boundary (0).
                sl = [slice(None)] * len(shape)
                sl[axis] = slice(0, -off)
                plane[tuple(sl)] = 0
        plane[plane != 0] = flat_dist
        planes.append(plane)
    return np.stack(planes, axis=0)


def create_ar_offsets_multichannel(
        shape: Tuple[int, ...],
        ar_dim_offsets_per_channel: List[List[List[int]]]) -> np.ndarray:
    """Per-channel variant: each channel gets its own dim offsets.

    Parity with reference ar_utils.py:22-41. shape = (B, C, ...);
    returns (order, B, C, ...).
    """
    out = []
    for ar_dim_offsets in ar_dim_offsets_per_channel:
        if len(ar_dim_offsets) != shape[1]:
            raise ValueError("need one offset list per channel")
        per_channel = []
        for channel_idx, dim_offsets in enumerate(ar_dim_offsets):
            plane = create_ar_offsets(shape, [dim_offsets])[0]
            per_channel.append(plane[:, channel_idx])
        out.append(np.stack(per_channel, axis=1))
    return np.stack(out, axis=0)
