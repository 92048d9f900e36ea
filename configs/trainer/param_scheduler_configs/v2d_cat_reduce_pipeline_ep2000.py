"""Categorical-dimension reduction schedule (pipeline).

Parity: reference configs/trainer/param_scheduler_configs/v2d_cat_reduce_pipeline_ep2000.py —
anneals cat_reduce_temp toward 0 so soft categorical dims sharpen
(staged warm/anneal/freeze pipeline over 2000 epochs)."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.train.schedulers import ParamScheduler

config = [
    ParamScheduler("cat_reduce_temp", lambda ep: 1.0 if ep < 500 else (0.5 ** ((ep - 500) // 150) if ep < 1700 else 0.0)),
]
