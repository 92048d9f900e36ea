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


class TarShardDataset(DataLoaderInterface):
    """WebDataset-style tar-shard reader: every member of every matching
    tar shard is one sample (bytes; images decoded when decode_images).

    Parity: the reference's webdataset dependency
    (configs/datasets/webdataset/base.py over wds.WebDataset) — re-realized
    with the stdlib tarfile so the zero-egress TPU image needs no extra
    package. Shards stream sequentially (the wds access pattern); an index
    of (shard, member) built at init gives O(1) random access for the
    benchmark workers.
    """

    def __init__(self, urls, decode_images: bool = False,
                 max_items: Optional[int] = None):
        import glob as _glob
        import tarfile
        if isinstance(urls, (str, Path)):
            urls = sorted(_glob.glob(str(urls)))
        self.shards = [str(u) for u in urls]
        self.decode_images = decode_images
        self._index = []
        for si, shard in enumerate(self.shards):
            with tarfile.open(shard) as tf:
                for m in tf.getmembers():
                    if m.isfile():
                        self._index.append((si, m.name))
        if max_items:
            self._index = self._index[:max_items]

    def get_length(self) -> int:
        return len(self._index)

    def get_data_at(self, idx: int):
        import io
        import tarfile
        si, name = self._index[idx]
        with tarfile.open(self.shards[si]) as tf:
            data = tf.extractfile(name).read()
        if self.decode_images:
            from PIL import Image
            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return data

    def iterate(self):
        import tarfile
        for si, shard in enumerate(self.shards):
            with tarfile.open(shard) as tf:
                for m in tf.getmembers():
                    if m.isfile():
                        data = tf.extractfile(m).read()
                        if self.decode_images:
                            import io

                            from PIL import Image
                            yield np.asarray(Image.open(
                                io.BytesIO(data)).convert("RGB"))
                        else:
                            yield data


class PandasTableDataset(DataLoaderInterface):
    """Rows of a pandas-readable table serialized back to bytes per row.

    Parity: the reference's pandas_table dataset + serialize configs
    (configs/datasets/pandas_table/, serialize/csv.py + json.py):
    serialize_format selects the per-row byte encoding fed to the
    byte-stream codecs.
    """

    def __init__(self, path: str, serialize_format: str = "csv",
                 serialize_config: Optional[dict] = None,
                 max_items: Optional[int] = None):
        import pandas as pd
        p = str(path)
        if p.endswith(".npy"):
            # packed raw-bytes records (tools/directory_to_pdrecords.py /
            # reference tools counterpart): one bytes column per row
            df = pd.DataFrame.from_records(
                np.load(p, allow_pickle=True))
        elif p.endswith(".json"):
            df = pd.read_json(p)
        elif p.endswith(".parquet"):
            df = pd.read_parquet(p)
        else:
            df = pd.read_csv(p)
        if max_items:
            df = df.iloc[:max_items]
        self.df = df
        self.serialize_format = serialize_format
        self.serialize_config = dict(serialize_config or {})

    def get_length(self) -> int:
        return len(self.df)

    def get_data_at(self, idx: int) -> bytes:
        row = self.df.iloc[idx: idx + 1]
        if self.serialize_format == "raw":
            # packed-bytes tables (.npy records): the cell IS the payload
            cell = self.df.iloc[idx, 0]
            return bytes(cell)
        if self.serialize_format == "json":
            return row.to_json(**self.serialize_config).encode()
        return row.to_csv(**self.serialize_config).encode()

    def iterate(self):
        for i in range(len(self.df)):
            yield self.get_data_at(i)


class DetectionDataset(DataLoaderInterface):
    """Detection samples: dicts of image + boxes (xyxy) + labels.

    Parity: the reference's detectron2 dataset configs
    (configs/datasets/detectron2/) — framework-free: images come from any
    image DataLoaderInterface, annotations from a COCO-style JSON when
    present, else procedurally generated boxes (zero-egress fallback)
    matching bench/task_metrics.py's detector-fn contract.
    """

    def __init__(self, image_dataset, annotations: Optional[str] = None,
                 num_random_boxes: int = 3, num_classes: int = 8,
                 seed: int = 0):
        self.images = image_dataset
        self.num_random_boxes = num_random_boxes
        self.num_classes = num_classes
        self.seed = seed
        self.anns = None
        if annotations and Path(annotations).is_file():
            import json
            coco = json.loads(Path(annotations).read_text())
            by_img = {}
            for a in coco.get("annotations", []):
                x, y, w, h = a["bbox"]
                by_img.setdefault(a["image_id"], []).append(
                    ([x, y, x + w, y + h], a["category_id"]))
            self.anns = by_img

    def get_length(self) -> int:
        return len(self.images)

    def get_data_at(self, idx: int) -> dict:
        img = self.images.get_data_at(idx)
        h, w = img.shape[:2]
        if self.anns is not None:
            pairs = self.anns.get(idx, [])
            boxes = np.asarray([p[0] for p in pairs], np.float32).reshape(
                -1, 4)
            labels = np.asarray([p[1] for p in pairs], np.int32)
        else:
            rng = np.random.default_rng(self.seed + idx)
            n = self.num_random_boxes
            x0 = rng.uniform(0, w * 0.6, n)
            y0 = rng.uniform(0, h * 0.6, n)
            boxes = np.stack([
                x0, y0,
                x0 + rng.uniform(w * 0.1, w * 0.4, n),
                y0 + rng.uniform(h * 0.1, h * 0.4, n)], axis=1).astype(
                np.float32)
            labels = rng.integers(0, self.num_classes, n).astype(np.int32)
        return {"image": img, "boxes": boxes, "labels": labels}

    def iterate(self):
        for i in range(len(self.images)):
            yield self.get_data_at(i)
