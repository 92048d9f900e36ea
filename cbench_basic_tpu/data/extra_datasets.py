"""Binary / tensor / table datasets (parity: reference
cbench/data/datasets/binary.py:8-83, tensors.py:10-81, tables.py:9-51):
non-image data sources for the lossless-compression side of the benchmark.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

from .datasets import DataLoaderInterface


class BinaryFileDataset(DataLoaderInterface):
    """Files under a directory served as byte chunks."""

    def __init__(self, root: str, chunk_size: Optional[int] = None,
                 max_items: Optional[int] = None):
        self.files = sorted(p for p in Path(root).rglob("*") if p.is_file())
        if max_items:
            self.files = self.files[:max_items]
        self.chunk_size = chunk_size

    def get_length(self):
        return len(self.files)

    def get_data_at(self, idx: int) -> bytes:
        data = self.files[idx].read_bytes()
        return data[: self.chunk_size] if self.chunk_size else data

    def iterate(self):
        for i in range(len(self.files)):
            yield self.get_data_at(i)


class TensorDataset(DataLoaderInterface):
    """In-memory array rows (parity: tensors.py)."""

    def __init__(self, array):
        self.array = np.asarray(array)

    def get_length(self):
        return len(self.array)

    def get_data_at(self, idx: int):
        return self.array[idx]

    def iterate(self):
        yield from self.array


class NpzTensorDataset(TensorDataset):
    def __init__(self, path: str, key: Optional[str] = None):
        with np.load(path) as f:
            key = key or list(f.keys())[0]
            super().__init__(f[key])


class TableDataset(DataLoaderInterface):
    """Rows of a delimited text table as byte strings (parity: tables.py)."""

    def __init__(self, path: str, delimiter: str = "\n",
                 max_items: Optional[int] = None):
        raw = Path(path).read_bytes().decode("utf-8", errors="replace")
        self.rows = [r.encode() for r in raw.split(delimiter) if r]
        if max_items:
            self.rows = self.rows[:max_items]

    def get_length(self):
        return len(self.rows)

    def get_data_at(self, idx: int) -> bytes:
        return self.rows[idx]

    def iterate(self):
        yield from self.rows
