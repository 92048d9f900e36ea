"""Common training setup (parity: reference configs/presets/common_trainer.py:18-56:
total batch 32, 2000 epochs stage-1, Adam 1e-4 + aux 1e-3, grad clip 1.0,
ImageNet-subset8000 train / Kodak val). Air-gapped fallback: synthetic data.

Env knobs: CBENCH_EPOCHS, CBENCH_BATCH, CBENCH_PATCH, CBENCH_STEPS_PER_EPOCH
shrink the schedule for smoke runs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cbench_basic_tpu.config import ClassBuilder
from cbench_basic_tpu.data.datasets import (
    BatchedPatchLoader,
    ImageFolderDataset,
    SyntheticImageDataset,
)
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

import env

NUM_EPOCHS = int(os.environ.get("CBENCH_EPOCHS", 2000))
BATCH_SIZE = int(os.environ.get("CBENCH_BATCH", 32))
PATCH_SIZE = int(os.environ.get("CBENCH_PATCH", 256))
STEPS_PER_EPOCH = os.environ.get("CBENCH_STEPS_PER_EPOCH")
STEPS_PER_EPOCH = int(STEPS_PER_EPOCH) if STEPS_PER_EPOCH else None


def train_dataset_builder():
    if os.path.isdir(env.TRAIN_DATA_DIR):
        return ClassBuilder(ImageFolderDataset, env.TRAIN_DATA_DIR)
    return ClassBuilder(SyntheticImageDataset, num_items=64,
                        height=PATCH_SIZE, width=PATCH_SIZE)


def test_dataset_builder():
    if os.path.isdir(env.TEST_DATA_DIR):
        return ClassBuilder(ImageFolderDataset, env.TEST_DATA_DIR)
    return ClassBuilder(SyntheticImageDataset, num_items=4,
                        height=512, width=768)


def trainer_builder(num_epochs=None):
    return ClassBuilder(
        NeuralCodecTrainer,
        dataloader=ClassBuilder(
            BatchedPatchLoader, train_dataset_builder(),
            batch_size=BATCH_SIZE, patch_size=PATCH_SIZE,
            steps_per_epoch=STEPS_PER_EPOCH),
        num_epochs=num_epochs or NUM_EPOCHS,
        learning_rate=1e-4, aux_learning_rate=1e-3, grad_clip=1.0,
    )
