"""Categorical-dimension reduction schedule (exponential).

Parity: reference configs/trainer/param_scheduler_configs/v2d_cat_reduce_exp50.py —
anneals cat_reduce_temp toward 0 so soft categorical dims sharpen
(halves every 50 epochs)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

config = [
    ParamScheduler("cat_reduce_temp", lambda ep: math.exp(math.log(0.5) / 50) ** ep),
]
