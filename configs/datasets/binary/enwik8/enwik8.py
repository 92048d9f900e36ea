"""Dataset sub-config: enwik8 (first 100 MB of English Wikipedia).

Parity: reference configs/datasets/binary/enwik8/enwik8.py over
BinaryFilesDataset — whole-file samples; synthetic text-like byte fallback
when the corpus is absent (zero-egress).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.extra_datasets import (
    BinaryFileDataset,
    TensorDataset,
)


class _SyntheticBytes:
    """Markov-ish synthetic text corpus (repeatable, compressible)."""

    def __init__(self, num_items=4, size=65536, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        words = [rng.integers(97, 123, rng.integers(2, 10)).astype("u1")
                 for _ in range(200)]
        self.items = []
        for i in range(num_items):
            out = bytearray()
            while len(out) < size:
                out += bytes(words[int(rng.integers(0, 200))]) + b" "
            self.items.append(bytes(out[:size]))

    def get_length(self):
        return len(self.items)

    def get_data_at(self, idx):
        return self.items[idx]

    def __len__(self):
        return len(self.items)

    def iterate(self):
        yield from self.items


def _build(root="data/enwik8", chunk_size=None, num_items=4, size=65536):
    if os.path.isdir(root):
        return BinaryFileDataset(root, chunk_size=chunk_size)
    return _SyntheticBytes(num_items=num_items, size=size)


config = ClassBuilder(
    _build,
    root=ParamSlot("root", default="data/enwik8"),
    chunk_size=ParamSlot("chunk_size", default=None),
    num_items=ParamSlot("num_items", default=4),
    size=ParamSlot("size", default=65536),
).set_override_name("enwik8")
