"""Categorical-dimension reduction schedule (linear).

Parity: reference configs/trainer/param_scheduler_configs/v2d_cat_reduce_linear1000.py —
anneals cat_reduce_temp toward 0 so soft categorical dims sharpen
(linear to 0 over 1000 epochs)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

config = [
    ParamScheduler("cat_reduce_temp", lambda ep: max(0.0, 1.0 - ep / 1000.0)),
]
