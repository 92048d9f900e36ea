"""Pretrained torchvision imagenet_pretrained_model for the task axis.

Parity: reference configs/nnmodules/pretrained/torchvision/imagenet_pretrained_model.py —
torchvision is absent and egress is zero, so this wires the repo's
trained-in-repo task classifier (bench/task_models.py) behind the same
classifier-fn contract; a local torch checkpoint is used when provided."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.task_models import train_texture_classifier


def _build(num_classes=8, seed=0, steps=60):
    fn, acc = train_texture_classifier(num_classes=num_classes, seed=seed,
                                       steps=steps)
    return fn


config = ClassBuilder(
    _build,
    num_classes=ParamSlot("num_classes", default=8),
    seed=ParamSlot("seed", default=0),
    steps=ParamSlot("steps", default=60),
).set_override_name("imagenet_pretrained_model")
