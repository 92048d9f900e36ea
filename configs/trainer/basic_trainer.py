"""Sub-config: the non-NN BasicTrainer at the trainer library level.

Parity: reference configs/trainer/basic_trainer.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.train.basic_trainer import BasicTrainer

config = ClassBuilder(
    BasicTrainer,
    dataloader=ParamSlot("dataloader", default=None),
    mode=ParamSlot("mode", default="full"),
).add_all_kwargs_as_param_slot().set_override_name("basic_trainer")
