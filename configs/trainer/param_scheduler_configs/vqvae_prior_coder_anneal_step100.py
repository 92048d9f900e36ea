"""VQ-VAE prior-coder temperature annealing (step 100).

Parity: reference configs/trainer/param_scheduler_configs/vqvae_prior_coder_anneal_step100.py —
StepLR(step_size=100, gamma=0.5) on gs_temp / relax_temp /
entropy_temp / var_scale."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

_STEP = 100


def _decay(start):
    return lambda ep: start * (0.5 ** (ep // _STEP))


config = [
    ParamScheduler("gs_temp", _decay(1.0)),
    ParamScheduler("relax_temp", _decay(1.0)),
    ParamScheduler("entropy_temp", _decay(1.0)),
    ParamScheduler("var_scale", _decay(1.0)),
]
