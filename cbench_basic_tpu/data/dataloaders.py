"""Data loaders over DataLoaderInterface datasets.

Parity: reference cbench/data/dataloaders.py (BasicDataLoader,
PyTorchDataLoader — wired by configs/dataloaders/{basic,torch,
torch_inmem}.py). TPU-era design: loaders yield host numpy batches with
STATIC shapes; the trainer owns device_put/sharding, so no pin_memory or
CUDA-stream machinery is needed. The torch-backed loader exists for
parity with torch-dataset pipelines (torch is CPU-only in this image) and
for its multi-worker prefetching.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

from .datasets import DataLoaderInterface


class BasicDataLoader:
    """Sequential sample loader with an optional cap.

    Parity: BasicDataLoader (reference dataloaders.py; max_samples slot in
    configs/dataloaders/basic.py). Yields raw dataset samples one by one —
    the shape expected by the benchmark's per-sample workers.
    """

    def __init__(self, dataset: DataLoaderInterface,
                 max_samples: Optional[int] = None):
        self.dataset = dataset
        self.max_samples = max_samples

    def __len__(self):
        n = len(self.dataset)
        return min(n, self.max_samples) if self.max_samples else n

    def __iter__(self):
        for i, sample in enumerate(self.dataset.iterate()):
            if self.max_samples is not None and i >= self.max_samples:
                return
            yield sample

    def iterate(self):
        """DataLoaderInterface-style per-sample iteration (the benchmark
        worker's contract, bench/benchmark.py)."""
        yield from self


class TorchDataLoader:
    """torch.utils.data.DataLoader over a DataLoaderInterface, yielding
    numpy batches.

    Parity: PyTorchDataLoader (configs/dataloaders/torch.py slots:
    batch_size/shuffle/num_workers/persistent_workers). torch tensors are
    converted back to numpy at the boundary — JAX owns the device side.
    torch_inmem parity = num_workers=0.
    """

    def __init__(self, dataset: DataLoaderInterface, batch_size: int = 1,
                 shuffle: bool = True, num_workers: int = 0,
                 persistent_workers: bool = False, seed: int = 0,
                 collate: Optional[Callable[[list], Any]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.persistent_workers = persistent_workers and num_workers > 0
        self.seed = seed
        self.collate = collate
        self._loader = None

    def _build(self):
        import torch
        from torch.utils.data import DataLoader, Dataset

        outer = self.dataset

        class _Adapter(Dataset):
            def __len__(self):
                return len(outer)

            def __getitem__(self, idx):
                return outer.get_data_at(int(idx))

        def _collate(batch):
            if self.collate is not None:
                return self.collate(batch)
            first = batch[0]
            if isinstance(first, np.ndarray):
                return np.stack(batch)
            return batch

        g = torch.Generator()
        g.manual_seed(self.seed)
        return DataLoader(
            _Adapter(), batch_size=self.batch_size, shuffle=self.shuffle,
            num_workers=self.num_workers,
            persistent_workers=self.persistent_workers,
            generator=g, collate_fn=_collate)

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        if self._loader is None or not self.persistent_workers:
            self._loader = self._build()
        for batch in self._loader:
            yield batch

    # DataLoaderInterface-style per-sample iteration for the benchmark
    # worker: unbatches, honors an optional max_samples attribute.
    max_samples = None

    def iterate(self):
        count = 0
        for batch in self:
            arr = np.asarray(batch)
            samples = arr if arr.ndim >= 4 else arr[None]
            for s in (samples if self.batch_size > 1 or arr.ndim >= 4
                      else [arr]):
                if self.max_samples is not None and \
                        count >= self.max_samples:
                    return
                yield s
                count += 1


class DetectionBatchLoader:
    """Batches of detection samples (image/boxes/labels dicts) with
    images stacked when shapes agree, lists otherwise.

    Parity: the reference's detectron2 dataloader configs
    (configs/dataloaders/detectron2/) — framework-free; pairs with
    data/extra_datasets.py DetectionDataset and the benchmark's
    task_metrics detector contract.
    """

    def __init__(self, dataset, batch_size: int = 2, shuffle: bool = False,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idxs = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(idxs)
        for start in range(0, len(idxs), self.batch_size):
            chunk = [self.dataset.get_data_at(int(i))
                     for i in idxs[start:start + self.batch_size]]
            shapes = {c["image"].shape for c in chunk}
            batch = {
                "boxes": [c["boxes"] for c in chunk],
                "labels": [c["labels"] for c in chunk],
            }
            if len(shapes) == 1:
                batch["image"] = np.stack([c["image"] for c in chunk])
            else:
                batch["image"] = [c["image"] for c in chunk]
            yield batch
