"""Categorical-dimension reduction schedule (delayed).

Parity: reference configs/trainer/param_scheduler_configs/v2d_cat_reduce_start1000_ep2000.py —
anneals cat_reduce_temp toward 0 so soft categorical dims sharpen
(constant until epoch 1000 then linear to 0 at 2000)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

config = [
    ParamScheduler("cat_reduce_temp", lambda ep: 1.0 if ep < 1000 else max(0.0, 1.0 - (ep - 1000) / 1000.0)),
]
