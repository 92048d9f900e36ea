"""Categorical-dimension reduction schedule (staged).

Parity: reference configs/trainer/param_scheduler_configs/v2d_cat_reduce_ep2000_step20.py —
anneals cat_reduce_temp toward 0 so soft categorical dims sharpen
(20-step staircase over 2000 epochs)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

config = [
    ParamScheduler("cat_reduce_temp", lambda ep: 0.5 ** (ep // 100)),
]
