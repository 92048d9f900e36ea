"""nnmodules trainer sub-config: the non-NN BasicTrainer (full-pass /
iterative training of classic trainables like dictionary coders).

Parity: reference configs/nnmodules/trainer/basic_trainer.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.train.basic_trainer import BasicTrainer

config = ClassBuilder(
    BasicTrainer,
    dataloader=ParamSlot("dataloader", default=None),
    mode=ParamSlot("mode", default="full"),
).add_all_kwargs_as_param_slot().set_override_name("basic_trainer")
