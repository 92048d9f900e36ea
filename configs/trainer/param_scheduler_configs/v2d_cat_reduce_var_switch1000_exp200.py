"""Categorical-dimension reduction schedule (switched-exp).

Parity: reference configs/trainer/param_scheduler_configs/v2d_cat_reduce_var_switch1000_exp200.py —
anneals cat_reduce_temp toward 0 so soft categorical dims sharpen
(exp halving every 200 with hard switch at 1000)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

config = [
    ParamScheduler("cat_reduce_temp", lambda ep: (math.exp(math.log(0.5) / 200) ** ep) if ep < 1000 else 0.0),
]
