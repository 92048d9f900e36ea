"""Per-file dataset + dataloader config library (reference
configs/datasets/{images,torchvision,binary/enwik8,pandas_table,
webdataset,detectron2}/ and configs/dataloaders/) with zero-egress
synthetic fallbacks, plus the new data-layer classes
(NumpyImageDataset, PILImageDataset, TarShardDataset, PandasTableDataset,
DetectionDataset, BasicDataLoader/TorchDataLoader/DetectionBatchLoader)."""

import io
import os
import tarfile

import numpy as np
import pytest

from cbench_basic_tpu.config.import_utils import (
    import_all_config_from_dir,
    import_config_from_file,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
DS = os.path.join(REPO, "configs", "datasets")


@pytest.mark.parametrize("sub, expected", [
    ("images", 17), ("torchvision", 8), (os.path.join("binary", "enwik8"), 2),
    ("pandas_table", 1), ("webdataset", 1), ("detectron2", 2)])
def test_dataset_configs_build_and_read(sub, expected):
    cfgs = import_all_config_from_dir(os.path.join(DS, sub))
    assert len(cfgs) == expected
    for name, cfg in cfgs.items():
        obj = cfg.build_class()
        if hasattr(obj, "get_data_at") and len(obj):
            sample = obj.get_data_at(0)
            assert sample is not None, name


def test_config_file_does_not_shadow_packages():
    """configs/dataloaders/torch.py must not hijack `import torch`
    (import_config_from_file namespaces its sys.modules key)."""
    import_config_from_file(
        os.path.join(REPO, "configs", "dataloaders", "torch.py"))
    import torch
    assert hasattr(torch, "utils"), "torch was shadowed by a config module"
    from torch.utils.data import DataLoader  # noqa: F401 — importable


def test_loaders_over_synthetic_dataset():
    from cbench_basic_tpu.data.datasets import SyntheticImageDataset
    ds = SyntheticImageDataset(num_items=4, height=32, width=32)

    basic = import_config_from_file(
        os.path.join(REPO, "configs", "dataloaders", "basic.py"))
    basic.update_slot_params(dataset=ds, max_samples=2)
    assert sum(1 for _ in basic.build_class()) == 2

    tcfg = import_config_from_file(
        os.path.join(REPO, "configs", "dataloaders", "torch_inmem.py"))
    tcfg.update_slot_params(dataset=ds, batch_size=2)
    batch = next(iter(tcfg.build_class()))
    assert np.asarray(batch).shape == (2, 32, 32, 3)


def test_detection_dataset_and_loader():
    from cbench_basic_tpu.data.datasets import SyntheticImageDataset
    from cbench_basic_tpu.data.extra_datasets import DetectionDataset
    dd = DetectionDataset(SyntheticImageDataset(num_items=3, height=32,
                                                width=48))
    s = dd.get_data_at(0)
    assert s["image"].shape == (32, 48, 3)
    assert s["boxes"].shape[1] == 4 and len(s["labels"]) == len(s["boxes"])
    # boxes stay inside a loose image bound and are deterministic
    assert np.allclose(dd.get_data_at(0)["boxes"], s["boxes"])

    lcfg = import_config_from_file(os.path.join(
        REPO, "configs", "dataloaders", "detectron2", "detection_test.py"))
    lcfg.update_slot_params(dataset=dd)
    batches = list(lcfg.build_class())
    assert len(batches) == 3 and batches[0]["image"].shape[0] == 1


def test_tar_shard_dataset_roundtrip(tmp_path):
    shard = tmp_path / "shard-000.tar"
    with tarfile.open(shard, "w") as tf:
        for i in range(3):
            data = f"sample-{i}".encode()
            info = tarfile.TarInfo(f"{i:04d}.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    cfg = import_config_from_file(
        os.path.join(DS, "webdataset", "base.py"))
    cfg.update_slot_params(urls=str(tmp_path / "*.tar"))
    ds = cfg.build_class()
    assert len(ds) == 3
    assert ds.get_data_at(1) == b"sample-1"
    assert list(ds.iterate())[2] == b"sample-2"


def test_pandas_stream_serialize_choices():
    cfg = import_config_from_file(
        os.path.join(DS, "pandas_table", "pandas_stream.py"))
    cfg.update_slot_params(serialize="json")
    ds = cfg.build_class()
    row = ds.get_data_at(0)
    assert row.startswith(b"{")  # json rows
    cfg2 = import_config_from_file(
        os.path.join(DS, "pandas_table", "pandas_stream.py"))
    ds2 = cfg2.build_class()
    assert b"," in ds2.get_data_at(0)  # csv rows


def test_numpy_and_pil_wrappers(tmp_path):
    from cbench_basic_tpu.data.datasets import (
        NumpyImageDataset,
        PILImageDataset,
    )
    arr = (np.random.default_rng(0).random((2, 8, 8, 3)) * 255).astype(
        np.uint8)
    nds = NumpyImageDataset(arr)
    assert nds.get_data_at(1).shape == (8, 8, 3)
    npz = tmp_path / "imgs.npz"
    np.savez(npz, images=arr)
    nds2 = NumpyImageDataset(str(npz))
    assert np.array_equal(nds2.get_data_at(0), arr[0])

    from PIL import Image
    p = tmp_path / "img.png"
    Image.fromarray(arr[0]).save(p)
    pds = PILImageDataset([p, arr[1]])
    assert np.array_equal(pds.get_data_at(0), arr[0])
    assert np.array_equal(pds.get_data_at(1), arr[1])
