"""Metric sub-config: Bjontegaard delta over collected (rate, quality)
points vs a reference curve.

Parity: reference configs/benchmark/metrics/bj_delta.py over
BJDeltaMetric (bench/metrics.py, reference sign convention)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.metrics import BJDeltaMetric

config = ClassBuilder(
    BJDeltaMetric,
    reference_pts=ParamSlot("reference_pts", default=None),
    collect_metric_names=ParamSlot(
        "collect_metric_names", default=("compressed_length", "psnr")),
    mode=ParamSlot("mode", default=0),
).set_override_name("bj_delta")
