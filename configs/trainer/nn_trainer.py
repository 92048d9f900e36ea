"""Sub-config: neural-codec trainer with addressable slots.

Parity: reference configs/trainer/nn_trainer.py + the trainer_configs /
model_wrapper_configs / param_scheduler_configs choice directories
(directories-as-choice-enums via import_all_config_from_dir, reference
nn_trainer.py:14-24; compressai_model = Adam 1e-4 + aux Adam 1e-3, grad
clip 1.0, val every 10 epochs).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import (
    import_all_config_from_dir,
    import_config_from_file,
)
from cbench_basic_tpu.data.datasets import BatchedPatchLoader
from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

_HERE = os.path.dirname(os.path.abspath(__file__))
TRAINER_CONFIGS = import_all_config_from_dir(
    os.path.join(_HERE, "trainer_configs"))
MODEL_WRAPPER_CONFIGS = import_all_config_from_dir(
    os.path.join(_HERE, "model_wrapper_configs"))
PARAM_SCHEDULER_CONFIGS = import_all_config_from_dir(
    os.path.join(_HERE, "param_scheduler_configs"))


def _trainer_with_configs(trainer_config=None, model_wrapper_config=None,
                          param_scheduler_config=None, **kwargs):
    """Merge the chosen config-dir dicts into NeuralCodecTrainer kwargs
    (the repo analog of the reference's trainer_config /
    model_wrapper_config / param_scheduler_configs ParamSlots). Explicit
    kwargs win over dict entries, matching slot-override semantics."""
    merged = dict(kwargs)
    # Chosen config dicts override the builder's slot defaults — picking a
    # wrapper config IS the optimizer spec (reference model_wrapper_config
    # semantics, nn/trainer.py:1074-1108).
    for cfg in (trainer_config, model_wrapper_config):
        if cfg:
            merged.update(cfg)
    if param_scheduler_config:
        merged["param_schedulers"] = tuple(param_scheduler_config)
    return NeuralCodecTrainer(**merged)

# Explicit file import: "datasets" would collide with the HF package.
_synthetic_config = import_config_from_file(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "datasets",
    "synthetic.py"))


def _loader(dataset_builder, batch_size, patch_size, steps_per_epoch, seed):
    return ClassBuilder(BatchedPatchLoader, dataset_builder,
                        batch_size=batch_size, patch_size=patch_size,
                        steps_per_epoch=steps_per_epoch, seed=seed)


# Smoke-run env knobs (same convention as presets/common_trainer.py).
_EPOCHS = int(os.environ.get("CBENCH_EPOCHS", 2000))
_BATCH = int(os.environ.get("CBENCH_BATCH", 32))
_PATCH = int(os.environ.get("CBENCH_PATCH", 256))
_STEPS = os.environ.get("CBENCH_STEPS_PER_EPOCH")
_STEPS = int(_STEPS) if _STEPS else None


def make_trainer_builder(train_dataset=None, val_dataset=None):
    train_dataset = train_dataset or _synthetic_config.clone(copy_slot_data=True)
    return ClassBuilder(
        _trainer_with_configs,
        trainer_config=ParamSlot("trainer_config", default="empty",
                                 choices=TRAINER_CONFIGS),
        model_wrapper_config=ParamSlot("model_wrapper_config",
                                       default="empty",
                                       choices=MODEL_WRAPPER_CONFIGS),
        param_scheduler_config=ParamSlot("param_scheduler_config",
                                         default="empty",
                                         choices=PARAM_SCHEDULER_CONFIGS),
        dataloader=_loader(
            train_dataset,
            batch_size=ParamSlot("batch_size", default=_BATCH),
            patch_size=ParamSlot("patch_size", default=_PATCH),
            steps_per_epoch=ParamSlot("steps_per_epoch", default=_STEPS),
            seed=ParamSlot("data_seed", default=0)),
        num_epochs=ParamSlot("num_epochs", default=_EPOCHS),
        learning_rate=ParamSlot("learning_rate", default=1e-4),
        aux_learning_rate=ParamSlot("aux_learning_rate", default=1e-3),
        grad_clip=ParamSlot("grad_clip", default=1.0),
        val_every_epochs=ParamSlot("val_every_epochs", default=10),
        data_parallel=ParamSlot("data_parallel", default=True),
        spatial_parallel=ParamSlot("spatial_parallel", default=1),
        scan_steps=ParamSlot("scan_steps", default=0),
        rate_level_lambdas=ParamSlot("rate_level_lambdas", default=None),
        parallel_replicas=ParamSlot("parallel_replicas", default=False),
        checkpoint_every_epochs=ParamSlot("ckpt_every", default=10),
    )


config = make_trainer_builder().set_override_name("nn_trainer")
