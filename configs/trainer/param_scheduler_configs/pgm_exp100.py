"""Topogroup-PGM annealing scheme, 100-epoch timescale.

Parity: reference configs/trainer/param_scheduler_configs/pgm_exp100.py —
gs_temp halves every 100 epochs (ExponentialLR gamma=exp(ln 0.5/100)),
the MC (VIMCO/REINFORCE) loss weight switches ON after epoch 100, and the
random-mask exploration weight switches OFF there. Expressed as repo
ParamSchedulers (step-indexed; the trainer maps epochs to steps)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

_N = 100
_GAMMA = math.exp(math.log(0.5) / _N)

config = [
    ParamScheduler("gs_temp", lambda ep: 2.0 * (_GAMMA ** ep)),
    ParamScheduler("mc_loss_weight", lambda ep: 1.0 if ep > _N else 0.0),
    ParamScheduler("random_mask_weight",
                   lambda ep: 0.0 if ep > _N else 1.0),
]
