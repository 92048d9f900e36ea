"""Dataloader sub-config: on-device patch sampler for the scanned
training loop (NeuralCodecTrainer scan_steps=K).

TPU-native addition without a reference counterpart (the reference's
loaders are all host-side, configs/dataloaders/*): the dataset is
materialized into HBM once and batches are sampled as pure functions of
a PRNG key, so the trainer can run whole chunks of steps in one XLA
dispatch (data/device_data.py)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.device_data import DevicePatchSampler

config = ClassBuilder(
    DevicePatchSampler.from_dataset,
    dataset=ParamSlot("dataset"),
    patch_size=ParamSlot("patch_size", default=128),
    batch_size=ParamSlot("batch_size", default=16),
    augment=ParamSlot("augment", default=True),
    steps_per_epoch=ParamSlot("steps_per_epoch", default=1000),
    max_images=ParamSlot("max_images", default=None),
).set_override_name("device_patch_loader")
