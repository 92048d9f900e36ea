"""LR / parameter schedules (parity: reference cbench/nn/lr_schedulers.py
custom warmup/cosine schedules and the ParamScheduler callback that anneals
non-gradient parameters like the Gumbel temperature, nn/trainer.py:756-818).

Optax-native: schedules are plain step->value functions composable with
optax.scale_by_schedule / inject_hyperparams.
"""

from __future__ import annotations

from typing import Callable

import optax


def warmup_cosine(peak_lr: float, warmup_steps: int, total_steps: int,
                  end_lr: float = 0.0) -> Callable[[int], float]:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=total_steps, end_value=end_lr)


def step_decay(base_lr: float, step_size: int, gamma: float = 0.5):
    def schedule(step):
        return base_lr * (gamma ** (step // step_size))
    return schedule


def exponential_anneal(start: float, end: float, total_steps: int):
    """For non-gradient parameters (e.g. relaxation temperature): exponential
    interpolation start -> end over total_steps."""
    ratio = end / start

    def schedule(step):
        t = min(max(step / max(total_steps, 1), 0.0), 1.0)
        return start * (ratio ** t)
    return schedule


class ParamScheduler:
    """Anneal a named scalar (e.g. topo_temperature) during training —
    the functional analog of the reference's dummy-optimizer param
    scheduler. The trainer calls .value(step) and passes it to the model
    via edge kwargs or coder attrs."""

    def __init__(self, name: str, schedule: Callable[[int], float]):
        self.name = name
        self.schedule = schedule

    def value(self, step: int) -> float:
        return float(self.schedule(step))
