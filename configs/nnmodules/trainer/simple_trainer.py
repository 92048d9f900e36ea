"""nnmodules trainer sub-config: minimal single-device NN trainer (no
validation / checkpoint machinery).

Parity: reference configs/nnmodules/trainer/simple_trainer.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

config = ClassBuilder(
    NeuralCodecTrainer,
    dataloader=ParamSlot("dataloader", default=None),
    num_epochs=ParamSlot("num_epochs", default=1),
    learning_rate=ParamSlot("learning_rate", default=1e-4),
    data_parallel=ParamSlot("data_parallel", default=False),
).set_override_name("simple_trainer")
