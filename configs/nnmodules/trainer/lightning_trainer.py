"""nnmodules trainer sub-config: the full-featured trainer (validation,
best-checkpoint restore, finite guard, schedulers, TB logging) — the
Lightning-stack equivalent.

Parity: reference configs/nnmodules/trainer/lightning_trainer.py, with
trainer_configs / model_wrapper_configs / param_scheduler_configs choice
dirs beside it (directories-as-choice-enums)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_all_config_from_dir
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

TRAINER_CONFIGS = import_all_config_from_dir(
    os.path.join(_HERE, "trainer_configs"))
MODEL_WRAPPER_CONFIGS = import_all_config_from_dir(
    os.path.join(_HERE, "model_wrapper_configs"))
PARAM_SCHEDULER_CONFIGS = import_all_config_from_dir(
    os.path.join(_HERE, "param_scheduler_configs"))


def _build(trainer_config="empty", model_wrapper_config="empty",
           param_scheduler_config="empty", **kwargs):
    merged = dict(kwargs)
    for choice, table in ((trainer_config, TRAINER_CONFIGS),
                          (model_wrapper_config, MODEL_WRAPPER_CONFIGS)):
        merged.update(table.get(choice, {}))
    sched = PARAM_SCHEDULER_CONFIGS.get(param_scheduler_config)
    if sched:
        merged["param_schedulers"] = tuple(sched)
    return NeuralCodecTrainer(**merged)


config = ClassBuilder(
    _build,
    trainer_config=ParamSlot("trainer_config", default="empty",
                             choices=sorted(TRAINER_CONFIGS)),
    model_wrapper_config=ParamSlot("model_wrapper_config", default="empty",
                                   choices=sorted(MODEL_WRAPPER_CONFIGS)),
    param_scheduler_config=ParamSlot(
        "param_scheduler_config", default="empty",
        choices=sorted(PARAM_SCHEDULER_CONFIGS)),
    num_epochs=ParamSlot("num_epochs", default=1),
).set_override_name("lightning_trainer")
